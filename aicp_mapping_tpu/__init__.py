"""aicp_mapping_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas implementation of the full AICP
(Auto-tuned Iterative Closest Point) pipeline — scan filtering, tiled
brute-force correspondence search, auto-tuned point-to-plane ICP,
octree-style overlap, alignment-risk failure prediction, reference-cloud
management — plus a distributed pose-graph backend over jax.sharding meshes
that the reference (zbqq/aicp_mapping, C++/ROS) does not have.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry correctness: TPU f32 matmuls default to single-pass bf16, which
# is ~0.24 m of error when transforming 60 m-scale lidar points and ~30 m^2
# in squared-distance matrices. Metric SLAM cannot tolerate that, so the
# engine forces full-f32 matmul precision process-wide; kernels that can
# safely use bf16 (none currently) must opt in explicitly per-call.
_jax.config.update("jax_default_matmul_precision", "float32")

from .cloud import AlignedCloud, AlignedCloudsGraph, Cloud, NormalCloud  # noqa: F401
from .geometry import se3  # noqa: F401
