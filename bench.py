#!/usr/bin/env python
"""AICP-TPU benchmark: full frame pipeline throughput on one chip.

Measures steady-state scans registered per second through the fused frame
step (prefilter -> occupancy overlap -> auto-tuned trimmed point-to-plane
ICP) on KITTI-scale synthetic scans, with windowed reference updates every 5
frames (the reference's operating point, aicp_ros_node.cpp:27).

Baseline: the reference repo publishes no benchmark numbers (BASELINE.md).
Its per-stage tic/toc instrumentation and the ICRA'17 operating regime put
CPU AICP at ~1 s per registered cloud on robot CPUs; we use 1.0 scans/s as
the conservative baseline. BASELINE.json's target is >= 10x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

BASELINE_SCANS_PER_SEC = 1.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from aicp_mapping_tpu.cloud import Cloud
    from aicp_mapping_tpu.geometry import se3
    from aicp_mapping_tpu.pipeline.config import PipelineConfig
    from aicp_mapping_tpu.pipeline.fused import (
        make_frame_step,
        make_reference_prep,
    )
    from aicp_mapping_tpu.pipeline.sequence import synthetic_sequence

    cfg = PipelineConfig(
        raw_capacity=65536,
        downsample_capacity=16384,
        filtered_capacity=8192,
    )
    frame_step = make_frame_step(cfg)
    ref_prep = make_reference_prep(cfg)

    # KITTI-scale synthetic drive: ~60k raw points per accumulated cloud
    items, _ = synthetic_sequence(
        n_frames=28, n_points=60000, step=1.2, seed=0,
        world_size=60.0, sensor_range=40.0, noise=0.02)

    viewpoints = [it[2][:3, 3].astype(np.float32) for it in items]
    clouds = [Cloud.from_numpy(it[1], capacity=cfg.raw_capacity)
              for it in items]

    vps = [jnp.asarray(v) for v in viewpoints]
    clouds = [jax.device_put(c) for c in clouds]

    # reference prep from frame 0
    ref = ref_prep(clouds[0].points, clouds[0].mask, vps[0])
    jax.block_until_ready(ref[0])

    def run_frame(i, ref):
        ref_pts, ref_mask, ref_normals = ref
        return frame_step(clouds[i].points, clouds[i].mask, vps[i],
                          ref_pts, ref_normals, ref_mask, se3.identity())

    # warmup / compile
    out = run_frame(1, ref)
    jax.block_until_ready(out.correction)

    # Sustained streaming throughput: frames are enqueued without per-frame
    # host sync — the streaming driver publishes corrected poses from the
    # *previous* total correction while registration is in flight
    # (reference semantics: app_ros.cpp:68-149, pose output never blocks on
    # registration), so per-frame host round-trips are not on the critical
    # path. Reference updates follow the windowed every-5 policy
    # (aicp_ros_node.cpp:27) and depend only on the incoming cloud, keeping
    # the device queue full.
    rates = []
    for _trial in range(3):
        t0 = time.perf_counter()
        outs = []
        r = ref
        n = 0
        for _rep in range(4):
            for i in range(2, len(clouds)):
                outs.append(run_frame(i, r).correction)
                if (i - 1) % 5 == 0:
                    r = ref_prep(clouds[i].points, clouds[i].mask, vps[i])
                n += 1
        jax.block_until_ready(outs)
        rates.append(n / (time.perf_counter() - t0))

    scans_per_sec = float(np.median(rates))
    print(json.dumps({
        "metric": "aicp_frame_pipeline_throughput",
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
