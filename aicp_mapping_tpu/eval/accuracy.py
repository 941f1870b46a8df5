"""Trajectory-accuracy regression on the outdoor-scale synthetic drive.

The reference's headline claim is trajectory accuracy on real outdoor
sequences (KITTI HDL-64, ANYmal VLP-16 — README.md:13-24) evaluated with
the KITTI devkit segment errors (evaluate_odometry.cpp:95-140) and its
15-registration golden regression (aicp_test.cpp:200-265). Neither dataset
ships in either repo, so this module pins accuracy on the raycast urban
drive (tools/urban.py): a 64-beam scanner at road speed with 90-degree
turns and realistic odometry drift.

Reported: KITTI segment errors (t_err %, r_err deg/m), ATE RMSE, RPE — for
the pipeline's corrected trajectory AND for odometry alone, so the artifact
shows how much of the injected drift the pipeline removes.

CLI:  python -m aicp_mapping_tpu.eval.accuracy --frames 200 --out ACCURACY.json
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np

from .kitti import ate_rmse, average_errors, calc_sequence_errors, rpe


def run_accuracy(n_frames: int = 200, seed: int = 0,
                 cfg=None, seq_kwargs: dict | None = None) -> dict:
    from ..pipeline.app import App
    from ..pipeline.config import PipelineConfig
    from ..pipeline.sequence import SequenceRunner
    from ..tools.urban import urban_sequence

    if cfg is None:
        # Outdoor operating point: debug working mode (open-loop replay
        # integrates the accumulated correction into each reading, the
        # reference's setAndFilterReading semantics, app.cpp:86-96) and
        # kNN region-growing segmentation (density-independent — fixed
        # 0.4 m neighborhoods go empty on walls beyond ~15 m).
        cfg = PipelineConfig(
            working_mode="debug",
            segmentation_method="region_growing",
            raw_capacity=65536,
            downsample_capacity=16384,
            filtered_capacity=8192,
        )
        # normal-space trimming: on the ground-dominated outdoor scene a
        # global trim quantile eats the facade correspondences under
        # horizontal drift (measured on this drive: t_err 0.127 -> 0.082 %,
        # ATE-noalign 0.039 -> 0.027 m at 60 frames)
        cfg.icp = dataclasses.replace(cfg.icp, trim_normal_space=True)
    items, gt = urban_sequence(n_frames=n_frames, seed=seed,
                               **(seq_kwargs or {}))
    app = App(cfg)
    frames = SequenceRunner(app).run_clouds(items)

    est = np.stack([np.asarray(f.corrected_pose) for f in frames])
    odom = np.stack([it[2] for it in items])
    n = min(len(est), len(gt))
    est, odom, gtp = est[:n], odom[:n], gt[:n]

    def metrics(traj):
        segs = calc_sequence_errors(gtp, traj, lengths=(50, 100, 150, 200))
        out = average_errors(segs)
        out["ate_rmse_m"] = ate_rmse(gtp, traj)
        out["ate_rmse_noalign_m"] = ate_rmse(gtp, traj, align=False)
        out.update(rpe(gtp, traj, delta=10))
        return out

    dropped = sum(1 for f in frames if not f.accepted)
    dist = float(np.sum(np.linalg.norm(
        np.diff(gtp[:, :3, 3], axis=0), axis=1)))
    return {
        "n_frames": n,
        "track_length_m": round(dist, 1),
        "dropped_frames": dropped,
        "pipeline": metrics(est),
        "odometry_only": metrics(odom),
    }


def main(argv=None) -> int:
    import argparse
    import os
    import time

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")

    p = argparse.ArgumentParser(description="trajectory accuracy regression")
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    t0 = time.perf_counter()
    result = run_accuracy(n_frames=args.frames, seed=args.seed)
    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    text = json.dumps(result, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
