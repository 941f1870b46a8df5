#!/usr/bin/env python
"""Per-frame profiling of the App-vs-fused throughput gap (round-4 item #1).

Measures, on the real chip:
  1. pure device rate of make_app_frame_step enqueued back-to-back
     (the App's own dispatch, no state machine) -- "appstep"
  2. pure device rate of make_frame_step (the bench_fused dispatch)
  3. staged App.submit_cloud loop (pre-wired clouds) with per-submit
     wall times and the drain/flush split
  4. wire_cloud host cost distribution
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from aicp_mapping_tpu.cloud import AlignedCloud, Cloud
    from aicp_mapping_tpu.geometry import se3
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.config import PipelineConfig
    from aicp_mapping_tpu.pipeline.fused import (
        make_app_frame_step, make_frame_step, make_reference_prep)
    from aicp_mapping_tpu.pipeline.sequence import synthetic_sequence, wire_cloud

    cfg = PipelineConfig(
        raw_capacity=65536, downsample_capacity=16384,
        filtered_capacity=8192, pipeline_depth=16,
        quantized_upload=True, wire_voxel=0.08, async_finalize=True)
    cfg.icp = dataclasses.replace(cfg.icp, coarse_iterations=6,
                                  coarse_decimation=8)
    items, _ = synthetic_sequence(
        n_frames=28, n_points=60000, step=1.2, seed=0,
        world_size=60.0, sensor_range=40.0, noise=0.02)

    out = {}

    # ---- wire_cloud host cost ----
    wts = []
    for it in items:
        t0 = time.perf_counter()
        wire_cloud(cfg, it[1])
        wts.append(time.perf_counter() - t0)
    out["wire_ms_median"] = round(float(np.median(wts)) * 1e3, 2)

    # ---- pure app-step device rate (wire clouds, graph-mode args) ----
    app_step = make_app_frame_step(cfg, with_risk=False, with_classifier=False)
    ref_prep = make_reference_prep(cfg)
    clouds = [jax.device_put(wire_cloud(cfg, it[1])) for it in items]
    poses = [np.asarray(it[2], np.float32) for it in items]
    vp0 = jnp.asarray(poses[0][:3, 3])
    ref = ref_prep(clouds[0].points, clouds[0].mask, vp0)
    jax.block_until_ready(ref[0])
    clf = (jnp.zeros((10,), jnp.float32), jnp.float32(0.0),
           jnp.zeros((2,), jnp.float32), jnp.ones((2,), jnp.float32))
    total = jnp.eye(4, dtype=jnp.float32)

    def run_app_step(i, ref, total):
        return app_step(clouds[i].points, clouds[i].mask, poses[i], total,
                        ref[0], ref[2], ref[1], poses[0],
                        np.float32(-1.0), np.bool_(False), *clf)

    o = run_app_step(1, ref, total)
    jax.block_until_ready(o.correction)
    for tag, reps in [("appstep", 4)]:
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = []
            r, tt = ref, total
            n = 0
            for _rep in range(reps):
                for i in range(2, len(clouds)):
                    oo = run_app_step(i, r, tt)
                    tt = oo.new_total
                    outs.append(oo.correction)
                    if (i - 1) % 5 == 0:
                        r = (oo.aligned_points, oo.filtered_mask,
                             oo.aligned_normals)
                    n += 1
            jax.block_until_ready(outs)
            rates.append(n / (time.perf_counter() - t0))
        out[f"{tag}_scans_per_sec"] = round(float(np.median(rates)), 2)

    # ---- pure fused-step device rate at the SAME wire operating point ----
    frame_step = make_frame_step(cfg)

    def run_fused(i, ref):
        return frame_step(clouds[i].points, clouds[i].mask,
                          jnp.asarray(poses[i][:3, 3]),
                          ref[0], ref[2], ref[1], se3.identity())

    o = run_fused(1, ref)
    jax.block_until_ready(o.correction)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = []
        r = ref
        n = 0
        for _rep in range(4):
            for i in range(2, len(clouds)):
                outs.append(run_fused(i, r).correction)
                if (i - 1) % 5 == 0:
                    r = ref_prep(clouds[i].points, clouds[i].mask,
                                 jnp.asarray(poses[i][:3, 3]))
                n += 1
        jax.block_until_ready(outs)
        rates.append(n / (time.perf_counter() - t0))
    out["fusedstep_wire_scans_per_sec"] = round(float(np.median(rates)), 2)

    # ---- staged App loop with per-submit timing ----
    app = App(dataclasses.replace(cfg))
    staged = [(it[0], wire_cloud(cfg, it[1]), np.asarray(it[2], np.float32))
              for it in items]
    # warm/compile
    for utime, cloud, pose in staged[:2]:
        app.submit_cloud(AlignedCloud.create(utime, cloud, pose))
    app.flush()
    for trial in range(2):
        submits = []
        t0 = time.perf_counter()
        for utime, cloud, pose in staged[2:]:
            s0 = time.perf_counter()
            app.submit_cloud(AlignedCloud.create(utime, cloud, pose))
            submits.append(time.perf_counter() - s0)
        tsub = time.perf_counter() - t0
        app.flush()
        ttot = time.perf_counter() - t0
        out[f"staged{trial}_scans_per_sec"] = round(len(submits) / ttot, 2)
        out[f"staged{trial}_submit_ms"] = [round(s * 1e3, 2) for s in submits]
        out[f"staged{trial}_submit_total_ms"] = round(tsub * 1e3, 1)
        out[f"staged{trial}_flush_ms"] = round((ttot - tsub) * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
