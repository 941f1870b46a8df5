"""Pose-graph-backed SLAM mapper: AICP front-end + distributed back-end.

NEW relative to the reference (SURVEY.md §7, BASELINE.json): the reference's
frame-to-reference chain accumulates drift and its "graph" has no edges
(aligned_clouds_graph.hpp). This mapper:

  1. runs the AICP pipeline (App) as odometry front-end;
  2. treats every reference cloud as a keyframe;
  3. proposes loop closures between non-adjacent keyframes by occupancy
     overlap (the semantics the reference sketched but never wired in:
     `computeLoopClosureFromOverlap`, octrees_overlap.cpp:75-111);
  4. verifies each candidate with a trimmed point-to-plane ICP registration;
  5. optimizes the keyframe pose graph with Gauss-Newton (optionally
     edge-sharded over a device mesh) and rebuilds the map.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..cloud import Cloud
from ..geometry import se3
from ..ops.normals import radius_normals
from ..overlap.voxel_overlap import compute_overlap
from ..parallel.posegraph import (
    PoseGraph,
    optimize_pose_graph,
    optimize_pose_graph_sharded,
    pad_edges,
)
from ..registration.icp import clamp_trim_ratio, point_to_plane_icp
from .app import App
from .config import PipelineConfig


@dataclasses.dataclass
class Keyframe:
    index: int                  # graph cloud index in the App
    utime: int
    pose: np.ndarray            # (4, 4) corrected world pose
    cloud: Cloud                # world-frame filtered cloud


@dataclasses.dataclass
class LoopClosure:
    i: int                      # keyframe indices
    j: int
    measurement: np.ndarray     # (4, 4) Z_ij
    overlap: float
    inlier_rms: float


class PoseGraphMapper:
    def __init__(self, app: App, mesh: Optional[Mesh] = None,
                 mesh_axis: str = "graph",
                 min_loop_overlap: float = 35.0,
                 min_keyframe_gap: int = 3,
                 max_loop_distance: float = 10.0,
                 odom_weight_t: float = 100.0,
                 odom_weight_r: float = 400.0):
        self.app = app
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.min_loop_overlap = min_loop_overlap
        self.min_keyframe_gap = min_keyframe_gap
        self.max_loop_distance = max_loop_distance
        self.odom_weight_t = odom_weight_t
        self.odom_weight_r = odom_weight_r
        self.loop_closures: list[LoopClosure] = []

    # -------------------- keyframes --------------------
    def keyframes(self) -> list[Keyframe]:
        kfs = []
        for idx, c in enumerate(self.app.graph.clouds):
            if c.is_reference:
                kfs.append(Keyframe(
                    index=idx, utime=c.utime,
                    pose=np.asarray(c.corrected_pose),
                    cloud=c.cloud))
        return kfs

    # -------------------- loop closures --------------------
    def propose_loop_closures(self) -> list[LoopClosure]:
        """Overlap-gated candidates + ICP verification.

        The distance gate runs on host; surviving pairs have their occupancy
        overlap computed in one vmapped batch (a single device dispatch for
        all candidates instead of one per pair); only overlap-qualified
        pairs pay for ICP verification."""
        kfs = self.keyframes()
        cfg = self.app.cfg
        found = []
        pairs = []
        for a in range(len(kfs)):
            for b in range(a + self.min_keyframe_gap + 1, len(kfs)):
                d = np.linalg.norm(kfs[a].pose[:3, 3] - kfs[b].pose[:3, 3])
                if d <= self.max_loop_distance:
                    pairs.append((a, b))
        if not pairs:
            self.loop_closures = []
            return []

        pts = jnp.stack([k.cloud.points for k in kfs])
        msk = jnp.stack([k.cloud.mask for k in kfs])
        ia = jnp.asarray([p[0] for p in pairs], jnp.int32)
        ib = jnp.asarray([p[1] for p in pairs], jnp.int32)
        ovs = jax.vmap(
            lambda a, b: compute_overlap(pts[a], msk[a], pts[b], msk[b],
                                         cfg.octree_resolution).overlap_percent
        )(ia, ib)
        ovs = np.asarray(ovs)

        for (a, b), ov_pct in zip(pairs, ovs.tolist()):
            if ov_pct < self.min_loop_overlap:
                continue
            ka, kb = kfs[a], kfs[b]
            # verify with registration: align kb's cloud to ka's
            normals, _, _ = radius_normals(
                ka.cloud.points, ka.cloud.mask, 0.4,
                jnp.asarray(ka.pose[:3, 3]))
            res = point_to_plane_icp(
                kb.cloud.points, kb.cloud.mask,
                ka.cloud.points, normals, ka.cloud.mask,
                se3.identity(), clamp_trim_ratio(jnp.float32(ov_pct)),
                cfg.icp)
            U = np.asarray(res.T)
            rms = float(res.inlier_rms)
            if rms > 0.3 or np.any(
                    np.abs(U[:3, 3]) > cfg.max_correction_magnitude * 4):
                continue
            # Z_ij = T_i^{-1} (U T_j): the relative pose consistent with
            # the verified alignment of cloud j onto cloud i.
            Z = np.linalg.inv(ka.pose) @ (U @ kb.pose)
            found.append(LoopClosure(a, b, Z.astype(np.float32),
                                     ov_pct, rms))
        self.loop_closures = found
        return found

    # -------------------- optimization --------------------
    def build_graph(self, kfs: list[Keyframe]) -> PoseGraph:
        K = len(kfs)
        poses = jnp.asarray(np.stack([k.pose for k in kfs]))
        ei, ej, Z_list, w_list = [], [], [], []
        # odometry edges from the front-end's corrected chain
        for a in range(K - 1):
            ei.append(a)
            ej.append(a + 1)
            Z_list.append(np.linalg.inv(kfs[a].pose) @ kfs[a + 1].pose)
            w_list.append([self.odom_weight_t] * 3 + [self.odom_weight_r] * 3)
        for lc in self.loop_closures:
            ei.append(lc.i)
            ej.append(lc.j)
            Z_list.append(lc.measurement)
            # weight by registration quality
            s = 1.0 / max(lc.inlier_rms, 0.01) ** 2
            w_list.append([s] * 3 + [4.0 * s] * 3)
        edges = jnp.asarray(np.stack([ei, ej], axis=1).astype(np.int32))
        Z = jnp.asarray(np.stack(Z_list).astype(np.float32))
        w = jnp.asarray(np.asarray(w_list, np.float32))
        mask = jnp.ones((edges.shape[0],), bool)
        return PoseGraph(poses, edges, Z, w, mask)

    def optimize(self, gn_iters: int = 8) -> list[Keyframe]:
        """Run PGO over keyframes; returns keyframes with updated poses and
        updates the App's graph clouds + map in place."""
        kfs = self.keyframes()
        if len(kfs) < 2:
            return kfs
        graph = self.build_graph(kfs)
        if self.mesh is not None:
            n_dev = self.mesh.shape[self.mesh_axis]
            e, z, w, m = pad_edges(graph.edges, graph.measurements,
                                   graph.weights, n_dev)
            graph = PoseGraph(graph.poses, e, z, w, m)
            opt, chi2 = optimize_pose_graph_sharded(
                graph, self.mesh, axis=self.mesh_axis, gn_iters=gn_iters)
        else:
            opt, chi2 = optimize_pose_graph(graph, gn_iters=gn_iters)
        return self._apply_poses(kfs, np.asarray(opt))

    def _apply_poses(self, kfs: list[Keyframe],
                     opt_np: np.ndarray) -> list[Keyframe]:
        """Apply optimized poses to keyframe clouds + the App graph; rebuild
        the aligned map."""
        new_map = []
        for k, kf in enumerate(kfs):
            delta = opt_np[k] @ np.linalg.inv(kf.pose)
            moved = kf.cloud.transform(jnp.asarray(delta.astype(np.float32)))
            cloud_rec = self.app.graph.clouds[kf.index]
            cloud_rec.cloud = moved
            cloud_rec.corrected_pose = opt_np[k].astype(np.float32)
            kf.pose = opt_np[k]
            kf.cloud = moved
            new_map.append(moved.to_numpy())
        if new_map:
            self.app.aligned_map_np = np.concatenate(new_map)
        return kfs

    def run_plane_ba(self, gn_iters: int = 6, max_planes: int = 12,
                     min_points: int = 50,
                     pose_damping: float = 50.0) -> list[Keyframe]:
        """Plane-landmark bundle adjustment refinement (parallel/ba.py).

        Extracts plane clusters per keyframe (the alignability front-end's
        surfaces), associates them into world landmarks, and jointly refines
        keyframe poses + landmark planes with the Schur-complement GN —
        observation-sharded over the mesh when one is configured.

        `pose_damping` is the implicit prior pinning each pose to its
        current (PGO-refined) estimate. It must be ODOMETRY-SCALE, not
        epsilon: planes only constrain their normal directions, and a real
        scene routinely shows a pose nothing but ground + one facade
        family — with epsilon damping the unconstrained in-plane DOFs run
        away (measured: keyframe ATE 0.3 -> 387 m on an urban circuit at
        the old 1e-6 default). At ~50 (vs per-plane information in the
        hundreds) well-constrained DOFs still move freely."""
        from ..parallel.ba import (build_plane_ba, extract_planes,
                                   optimize_plane_ba,
                                   optimize_plane_ba_sharded,
                                   pad_observations)

        kfs = self.keyframes()
        if len(kfs) < 2:
            return kfs
        planes_l, w_l, v_l = [], [], []
        for kf in kfs:
            T_inv = jnp.asarray(
                np.linalg.inv(kf.pose).astype(np.float32))
            body = kf.cloud.transform(T_inv)
            normals, curv, _ = radius_normals(
                body.points, body.mask, 0.4, jnp.zeros((3,), jnp.float32))
            pl, w, v = extract_planes(body.points, body.mask, normals, curv,
                                      max_planes=max_planes,
                                      min_points=min_points)
            planes_l.append(np.asarray(pl))
            w_l.append(np.asarray(w))
            v_l.append(np.asarray(v))

        poses = np.stack([kf.pose for kf in kfs]).astype(np.float32)
        prob = build_plane_ba(poses, np.stack(planes_l), np.stack(w_l),
                              np.stack(v_l))
        if self.mesh is not None:
            n_dev = self.mesh.shape[self.mesh_axis]
            prob = pad_observations(prob, n_dev)
            opt, _, _ = optimize_plane_ba_sharded(
                prob, self.mesh, axis=self.mesh_axis, gn_iters=gn_iters,
                pose_damping=pose_damping)
        else:
            opt, _, _ = optimize_plane_ba(prob, gn_iters=gn_iters,
                                          pose_damping=pose_damping)
        return self._apply_poses(kfs, np.asarray(opt))

    def run_backend(self) -> dict:
        """Propose + optimize; returns a summary."""
        lcs = self.propose_loop_closures()
        kfs = self.optimize()
        return {
            "n_keyframes": len(kfs),
            "n_loop_closures": len(lcs),
            "loop_closures": [(lc.i, lc.j, lc.overlap) for lc in lcs],
        }
