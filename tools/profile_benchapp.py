#!/usr/bin/env python
"""Reproduce bench.py's bench_app in isolation to find why it reports ~68
scans/s while the identical loop in tools/profile_runner.py reaches ~110."""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    from aicp_mapping_tpu.pipeline.config import PipelineConfig

    cfg = PipelineConfig(
        raw_capacity=65536, downsample_capacity=16384,
        filtered_capacity=8192, pipeline_depth=16,
        quantized_upload=True, wire_voxel=0.08, async_finalize=True)
    cfg.icp = dataclasses.replace(cfg.icp, coarse_iterations=6,
                                  coarse_decimation=8)
    items = bench.make_inputs(cfg, n_frames=28)

    out = {}
    if "--with-fused" in sys.argv:
        out["fused"] = round(bench.bench_fused(cfg, items), 2)
    (rate, spread, lat_ms, staged, sspread, _) = bench.bench_app(cfg, items)
    out.update(app=round(rate, 2), app_spread=round(spread, 3),
               staged=round(staged, 2), lat_ms=round(lat_ms, 1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
