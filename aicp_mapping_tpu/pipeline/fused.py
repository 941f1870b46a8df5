"""Fused single-jit AICP frame step — the flagship compute path.

One `jax.jit` covering the whole hot loop of a frame (app.cpp:218-247:
prefilter -> overlap -> auto-tune -> trimmed point-to-plane ICP), so a frame
costs one dispatch and XLA can fuse across stages. Used by the benchmark,
the graft entry point, and (optionally) the App for maximum throughput.

The reference pays three process hops + a YAML-file rewrite per frame for
the same flow; here the auto-tuned trim ratio is a traced scalar flowing
from the overlap statistic directly into the outlier filter.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..ops.normals import estimate_normals
from ..ops.segmentation import plane_segmentation_filter
from ..ops.voxel import voxel_downsample, voxel_set_overlap
from ..registration.icp import ICPConfig, clamp_trim_ratio, point_to_plane_icp
from .config import PipelineConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedFrameOutput:
    correction: jax.Array       # (4, 4)
    overlap_percent: jax.Array  # scalar
    trim_ratio: jax.Array       # scalar
    n_iterations: jax.Array
    inlier_rms: jax.Array
    hessian: jax.Array          # (6, 6)
    filtered_points: jax.Array  # (F, 3) prefiltered reading (pre-correction)
    filtered_mask: jax.Array    # (F,)


def make_frame_step(cfg: PipelineConfig):
    """Returns a jitted fn:
    (reading_points, reading_mask, reading_viewpoint,
     ref_points, ref_normals, ref_mask, init_T) -> FusedFrameOutput
    """

    @jax.jit
    def frame_step(reading_points, reading_mask, reading_viewpoint,
                   ref_points, ref_normals, ref_mask, init_T):
        # Pre-filter: voxel 0.08 + planes-only (filteringUtils.cpp:5-45)
        dpts, dmask = voxel_downsample(reading_points, reading_mask,
                                       cfg.voxel_size, cfg.downsample_capacity)
        fpts, fmask, _, _, _ = plane_segmentation_filter(
            dpts, dmask, viewpoint=reading_viewpoint,
            normal_k=cfg.prefilter_normal_k, graph_k=cfg.graph_k,
            smoothness_deg=cfg.smoothness_deg,
            min_cluster_size=cfg.min_cluster_size,
            out_capacity=cfg.filtered_capacity)

        # Occupancy overlap at 0.2 m (octrees_overlap.cpp:29-72 semantics)
        n_common, n_ref, n_read = voxel_set_overlap(
            ref_points, ref_mask, fpts, fmask, cfg.octree_resolution)
        ra = n_common / jnp.maximum(n_ref, 1)
        rb = n_common / jnp.maximum(n_read, 1)
        overlap = jnp.minimum(ra, rb) * 100.0

        # Auto-tune + trimmed point-to-plane ICP (app.cpp:187-216)
        ratio = clamp_trim_ratio(overlap, cfg.trim_ratio_floor,
                                 cfg.trim_ratio_ceil)
        res = point_to_plane_icp(fpts, fmask, ref_points, ref_normals,
                                 ref_mask, init_T, ratio, cfg.icp)
        return FusedFrameOutput(
            correction=res.T,
            overlap_percent=overlap,
            trim_ratio=ratio,
            n_iterations=res.n_iterations,
            inlier_rms=res.inlier_rms,
            hessian=res.hessian,
            filtered_points=fpts,
            filtered_mask=fmask,
        )

    return frame_step


def make_reference_prep(cfg: PipelineConfig):
    """Jitted reference-side prep: prefilter + ICP normals.

    The hough prefilter already computes viewpoint-oriented radius normals
    for every surviving point (SurfaceNormalDataPointsFilter analog,
    icp_autotuned.yaml:12-23), so they are reused directly instead of a
    second kNN pass."""

    @jax.jit
    def prep(points, mask, viewpoint):
        dpts, dmask = voxel_downsample(points, mask, cfg.voxel_size,
                                       cfg.downsample_capacity)
        fpts, fmask, fnormals, _, _ = plane_segmentation_filter(
            dpts, dmask, viewpoint=viewpoint,
            normal_k=cfg.prefilter_normal_k, graph_k=cfg.graph_k,
            smoothness_deg=cfg.smoothness_deg,
            min_cluster_size=cfg.min_cluster_size,
            out_capacity=cfg.filtered_capacity)
        return fpts, fmask, fnormals

    return prep
