import os, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import dataclasses
import bench
from aicp_mapping_tpu.pipeline.config import PipelineConfig
cfg = PipelineConfig(raw_capacity=65536, downsample_capacity=16384,
                     filtered_capacity=8192, pipeline_depth=32,
                     quantized_upload=True, wire_voxel=0.08, async_finalize=True)
cfg.icp = dataclasses.replace(cfg.icp, coarse_iterations=6, coarse_decimation=8)
items = bench.make_inputs(cfg, n_frames=6)
for t in range(2):
    print(json.dumps(bench.bench_stages(cfg, items)), flush=True)
