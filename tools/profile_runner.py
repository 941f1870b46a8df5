#!/usr/bin/env python
"""Instrument SequenceRunner.run_clouds frame by frame on the real chip:
where do the ~5 ms/frame between staged (pre-wired) and live App go?"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main():
    from concurrent.futures import ThreadPoolExecutor

    from aicp_mapping_tpu.cloud import AlignedCloud
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.config import PipelineConfig
    from aicp_mapping_tpu.pipeline.sequence import (SequenceRunner,
                                                    synthetic_sequence,
                                                    wire_cloud)

    cfg = PipelineConfig(
        raw_capacity=65536, downsample_capacity=16384,
        filtered_capacity=8192, pipeline_depth=16,
        quantized_upload=True, wire_voxel=0.08, async_finalize=True)
    cfg.icp = dataclasses.replace(cfg.icp, coarse_iterations=6,
                                  coarse_decimation=8)
    items, _ = synthetic_sequence(
        n_frames=28, n_points=60000, step=1.2, seed=0,
        world_size=60.0, sensor_range=40.0, noise=0.02)

    app = App(dataclasses.replace(cfg))
    runner = SequenceRunner(app, pipelined=True)
    runner.run_clouds(items[:2])  # compile

    out = {}
    for trial in range(2):
        waits, drives, wires = [], [], []
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as ex:
            def timed_wire(pts):
                w0 = time.perf_counter()
                c = wire_cloud(cfg, pts)
                wires.append(time.perf_counter() - w0)
                return c

            fut = ex.submit(timed_wire, items[2][1])
            for i in range(2, len(items)):
                utime, pts, pose = items[i]
                s = time.perf_counter()
                cloud = fut.result()
                waits.append(time.perf_counter() - s)
                if i + 1 < len(items):
                    fut = ex.submit(timed_wire, items[i + 1][1])
                ac = AlignedCloud.create(utime, cloud,
                                         np.asarray(pose, np.float32))
                s = time.perf_counter()
                app.submit_cloud(ac)
                drives.append(time.perf_counter() - s)
        s = time.perf_counter()
        app.flush()
        flush_ms = (time.perf_counter() - s) * 1e3
        total = time.perf_counter() - t0
        out[f"t{trial}"] = {
            "scans_per_sec": round((len(items) - 2) / total, 2),
            "wire_ms": [round(w * 1e3, 2) for w in wires],
            "wait_ms": [round(w * 1e3, 2) for w in waits],
            "drive_ms": [round(w * 1e3, 2) for w in drives],
            "flush_ms": round(flush_ms, 1),
        }
    app.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
