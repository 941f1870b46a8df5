"""Batch pairwise registration experiments.

The reference drives all N x N cloud pairs through the standalone
registration CLI (bash/run_registration.sh), writing one result line per
pair (registration_main.cpp:503-515 `compare_results.txt`) that the
notebooks turn into overlap/accuracy matrices. This module is that driver
as a library: run every pair, collect the per-pair metrics, and emit both
the result-line file and the matrices directly.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass
class PairResult:
    reference_id: int
    reading_id: int
    octree_overlap: float
    fov_overlap: float
    alignability: float
    risk: float
    n_iterations: int
    inlier_rms: float
    correction: np.ndarray        # (4, 4)
    t_error: float = float("nan")  # vs ground truth, when available
    degeneracy: float = float("nan")  # ICP-Hessian predictors
    icn: float = float("nan")         # (filteringUtils.cpp:580-617)


def run_pairwise(clouds: Sequence[np.ndarray],
                 poses: Optional[Sequence[np.ndarray]] = None,
                 capacity: int = 8192,
                 classifier=None,
                 normal_radius: float = 0.4,
                 trim_floor: float = 0.25) -> list[PairResult]:
    """Register every ordered pair (i -> reference, j -> reading), i != j.

    `poses` are ground-truth world poses; when given, clouds are expressed
    in the world frame, the expected correction is the identity, and
    `t_error` reports |t| of the recovered correction.
    """
    import jax.numpy as jnp

    from ..cloud import Cloud
    from ..geometry import se3
    from ..ops.normals import radius_normals
    from ..overlap.alignability import alignability_filter
    from ..overlap.fov import fov_overlap
    from ..overlap.voxel_overlap import compute_overlap
    from ..registration.icp import (clamp_trim_ratio, degeneracy_predictions,
                                    point_to_plane_icp)

    cs = [Cloud.from_numpy(np.asarray(c, np.float32), capacity=capacity)
          for c in clouds]
    ps = [jnp.asarray(p, jnp.float32) for p in poses] if poses is not None \
        else [jnp.eye(4) for _ in cs]
    normals = [radius_normals(c.points, c.mask, normal_radius,
                              se3.translation(p))[0]
               for c, p in zip(cs, ps)]

    results = []
    for i in range(len(cs)):
        for j in range(len(cs)):
            if i == j:
                continue
            ref, read = cs[i], cs[j]
            ov = compute_overlap(ref.points, ref.mask, read.points, read.mask)
            ov_pct = float(ov.overlap_percent)
            fov, _, _ = fov_overlap(ref.points, ref.mask, ps[i],
                                    read.points, read.mask, ps[j])
            align, _ = alignability_filter(ref.points, ref.mask, ps[i],
                                           read.points, read.mask, ps[j])
            risk = -1.0
            if classifier is not None:
                risk = float(np.asarray(classifier.test(np.array(
                    [[ov_pct, float(align)]], np.float32))).reshape(-1)[0])
            res = point_to_plane_icp(
                read.points, read.mask, ref.points, normals[i], ref.mask,
                se3.identity(),
                clamp_trim_ratio(jnp.float32(ov_pct), trim_floor, 0.70))
            T = np.asarray(res.T)
            deg, icn = degeneracy_predictions(res.hessian)
            results.append(PairResult(
                reference_id=i, reading_id=j,
                octree_overlap=ov_pct, fov_overlap=float(fov),
                alignability=float(align), risk=risk,
                n_iterations=int(res.n_iterations),
                inlier_rms=float(res.inlier_rms), correction=T,
                t_error=float(np.linalg.norm(T[:3, 3]))
                if poses is not None else float("nan"),
                degeneracy=float(deg), icn=float(icn)))
    return results


def write_compare_results(path: str, results: list[PairResult]) -> None:
    """registration_main.cpp:503-515 result-line format analog: one line per
    pair with ids, the four metrics, iterations, rms and the correction."""
    with open(path, "w") as f:
        for r in results:
            t = r.correction.reshape(-1)
            vals = [r.reference_id, r.reading_id, r.octree_overlap,
                    r.fov_overlap, r.alignability, r.risk, r.n_iterations,
                    r.inlier_rms] + t.tolist()
            f.write(" ".join(f"{v:.6g}" for v in vals) + "\n")


def matrices(results: list[PairResult], n: int):
    """(overlap, accuracy) N x N matrices for the notebook analyses."""
    ov = np.full((n, n), np.nan)
    terr = np.full((n, n), np.nan)
    for r in results:
        ov[r.reference_id, r.reading_id] = r.octree_overlap
        terr[r.reference_id, r.reading_id] = r.t_error
    return ov, terr
