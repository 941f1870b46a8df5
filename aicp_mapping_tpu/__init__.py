"""aicp_mapping_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas implementation of the full AICP
(Auto-tuned Iterative Closest Point) pipeline — scan filtering, tiled
brute-force correspondence search, auto-tuned point-to-plane ICP,
octree-style overlap, alignment-risk failure prediction, reference-cloud
management — plus a distributed pose-graph backend over jax.sharding meshes
that the reference (zbqq/aicp_mapping, C++/ROS) does not have.
"""

__version__ = "0.1.0"

from .cloud import AlignedCloud, AlignedCloudsGraph, Cloud, NormalCloud  # noqa: F401
from .geometry import se3  # noqa: F401
