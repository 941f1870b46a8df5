"""Labelled-dataset generation for the alignment-risk classifier.

The reference ships hand-labelled experiment logs
(aicp_core/data/labels/*.txt, format `id overlap alignability label`, with
alignability stored in [0, 1]). Those labels came from batch pairwise
registration experiments where a pair is labelled a failure when its
registration error exceeds the accuracy threshold ("Accuracy vs Overlap"
notebook: accurate = translation error <= 2 cm).

This module reproduces that methodology on synthetic scenes so the package
carries a self-contained training set: sample scan pairs across an
overlap/geometry spectrum, compute the two features, register, and label by
ground-truth error.
"""
from __future__ import annotations

import numpy as np


def generate_labelled_pairs(n_pairs: int = 60, seed: int = 0,
                            capacity: int = 4096,
                            failure_t_err: float = 0.02):
    """Returns (features (N, 2) [overlap%, alignability 0-100], labels (N,))."""
    import jax.numpy as jnp

    from ..cloud import Cloud
    from ..geometry import se3
    from ..ops import estimate_normals
    from ..overlap.alignability import alignability_filter
    from ..overlap.voxel_overlap import compute_overlap
    from ..registration import clamp_trim_ratio, point_to_plane_icp
    from .synthetic import corridor_cloud, room_cloud

    rng = np.random.default_rng(seed)
    feats = []
    labels = []
    for i in range(n_pairs):
        degenerate = i % 3 == 2   # every third pair: corridor (low alignability)
        maker = corridor_cloud if degenerate else room_cloud
        world = maker(n=3000, seed=int(rng.integers(1 << 30)), noise=0.01)

        ref = Cloud.from_numpy(world, capacity=capacity)
        # reading: random subset shifted by a random offset; larger offsets
        # and smaller subsets -> lower overlap
        frac = rng.uniform(0.35, 1.0)
        sel = rng.choice(len(world), int(len(world) * frac), replace=False)
        offset = rng.normal(0, 0.8, 3) * rng.uniform(0, 1)
        offset[2] *= 0.2
        T_pert = np.eye(4, dtype=np.float32)
        T_pert[:3, 3] = offset
        reading_np = world[sel] @ T_pert[:3, :3].T + T_pert[:3, 3]
        reading = Cloud.from_numpy(reading_np, capacity=capacity)

        ov = float(compute_overlap(ref.points, ref.mask, reading.points,
                                   reading.mask).overlap_percent)
        align_j, _ = alignability_filter(
            ref.points, ref.mask, jnp.eye(4),
            reading.points, reading.mask, jnp.eye(4))
        align = float(align_j)

        normals, _, _ = estimate_normals(ref.points, ref.mask, k=12)
        ratio = clamp_trim_ratio(jnp.float32(ov))
        res = point_to_plane_icp(reading.points, reading.mask, ref.points,
                                 normals, ref.mask, se3.identity(), ratio)
        T = np.asarray(res.T)
        # ground truth correction = T_pert^-1
        err = T @ T_pert
        t_err = float(np.linalg.norm(err[:3, 3]))
        feats.append((ov, align))
        labels.append(1.0 if t_err > failure_t_err else 0.0)
    return np.asarray(feats, np.float32), np.asarray(labels, np.float32)


def write_label_file(path: str, features: np.ndarray,
                     labels: np.ndarray) -> None:
    """Write the reference's label format: `id overlap alignability label`
    with alignability scaled back to [0, 1] (data/labels/*.txt)."""
    with open(path, "w") as f:
        for i, ((ov, al), y) in enumerate(zip(features, labels)):
            f.write(f"{i} {ov:.4f} {al / 100.0:.6f} {int(y)} \n")


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="generate classifier label sets")
    p.add_argument("output_train")
    p.add_argument("output_test")
    p.add_argument("--n-train", type=int, default=90)
    p.add_argument("--n-test", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    ftr, ltr = generate_labelled_pairs(args.n_train, seed=args.seed)
    fte, lte = generate_labelled_pairs(args.n_test, seed=args.seed + 1)
    write_label_file(args.output_train, ftr, ltr)
    write_label_file(args.output_test, fte, lte)
    print(f"train: {len(ltr)} ({int(ltr.sum())} failures), "
          f"test: {len(lte)} ({int(lte.sum())} failures)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
