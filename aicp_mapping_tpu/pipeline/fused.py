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
            out_capacity=cfg.filtered_capacity,
            method=cfg.segmentation_method,
            normal_radius=cfg.normal_radius)

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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AppFrameOutput:
    """Everything App::processCloud needs from one device dispatch."""

    correction: jax.Array       # (4, 4)
    overlap_percent: jax.Array  # scalar (or the fixed override)
    fov_overlap: jax.Array      # scalar (-1 when risk stage is off)
    alignability: jax.Array     # scalar (-1 when risk stage is off)
    risk: jax.Array             # scalar (-1 without a classifier)
    trim_ratio: jax.Array
    n_iterations: jax.Array
    inlier_rms: jax.Array
    hessian: jax.Array          # (6, 6)
    filtered_points: jax.Array  # (F, 3) prefiltered reading, pre-correction
    filtered_mask: jax.Array    # (F,)
    filtered_normals: jax.Array  # (F, 3) viewpoint-oriented prefilter normals
    filtered_count: jax.Array   # scalar int32
    aligned_points: jax.Array   # (F, 3) correction @ filtered (graph storage)
    aligned_normals: jax.Array  # (F, 3) rotated normals (next reference)


def make_app_frame_step(cfg: PipelineConfig, with_risk: bool,
                        with_classifier: bool):
    """The App's whole per-frame hot block as ONE jit (app.cpp:218-247 is one
    unit in the reference too): debug pre-transform -> prefilter -> occupancy
    overlap -> [FOV overlap -> alignability -> classifier] -> auto-tune ->
    trimmed point-to-plane ICP -> aligned outputs.

    Host code performs exactly one device sync per frame on the scalar
    outputs; the risk gate and accept gate are host decisions over those
    scalars (risk-gated frames simply discard the computed correction — on
    TPU computing ICP unconditionally is cheaper than a mid-frame sync).

    Signature:
      (raw_points, raw_mask, pre_T, read_pose, ref_points, ref_normals,
       ref_mask, ref_pose, fixed_overlap, clf_w, clf_b, clf_mean, clf_std)
      -> AppFrameOutput

    fixed_overlap >= 0 overrides the computed overlap (prior-map mode pins
    it at 50.0, app.cpp:123-127). pre_T integrates the accumulated total
    correction into the reading in debug working mode (app.cpp:86-96);
    identity in robot mode.
    """

    @jax.jit
    def app_step(raw_points, raw_mask, pre_T, read_pose,
                 ref_points, ref_normals, ref_mask, ref_pose,
                 fixed_overlap, clf_w, clf_b, clf_mean, clf_std):
        pts = se3.transform_points(pre_T, raw_points)
        viewpoint = read_pose[:3, 3]

        # Pre-filter: voxel + planes-only (filteringUtils.cpp:5-45)
        dpts, dmask = voxel_downsample(pts, raw_mask, cfg.voxel_size,
                                       cfg.downsample_capacity)
        fpts, fmask, fnormals, _, _ = plane_segmentation_filter(
            dpts, dmask, viewpoint=viewpoint,
            normal_k=cfg.prefilter_normal_k, graph_k=cfg.graph_k,
            smoothness_deg=cfg.smoothness_deg,
            min_cluster_size=cfg.min_cluster_size,
            out_capacity=cfg.filtered_capacity,
            method=cfg.segmentation_method,
            normal_radius=cfg.normal_radius)

        # Occupancy overlap (octrees_overlap.cpp:29-72 semantics)
        n_common, n_ref, n_read = voxel_set_overlap(
            ref_points, ref_mask, fpts, fmask, cfg.octree_resolution)
        ra = n_common / jnp.maximum(n_ref, 1)
        rb = n_common / jnp.maximum(n_read, 1)
        overlap = jnp.minimum(ra, rb) * 100.0
        overlap = jnp.where(fixed_overlap >= 0.0, fixed_overlap, overlap)

        # Alignment risk (computeAlignmentRisk, app.cpp:143-185)
        if with_risk:
            from ..classification.classifier import poly3_features
            from ..overlap.alignability import alignability_filter
            from ..overlap.fov import fov_overlap

            fov, a_in_b, b_in_a = fov_overlap(
                ref_points, ref_mask, ref_pose, fpts, fmask, read_pose,
                cfg.sensor_range, cfg.sensor_angular_view)
            align, _ = alignability_filter(
                ref_points, a_in_b, ref_pose, fpts, b_in_a, read_pose,
                voxel_size=cfg.voxel_size,
                ds_capacity=cfg.align_ds_capacity,
                max_clusters=cfg.align_max_clusters)
            if with_classifier:
                z = (jnp.stack([overlap, align]) - clf_mean) / clf_std
                risk = jax.nn.sigmoid(poly3_features(z) @ clf_w + clf_b)
            else:
                risk = jnp.float32(-1.0)
        else:
            fov = jnp.float32(-1.0)
            align = jnp.float32(-1.0)
            risk = jnp.float32(-1.0)

        # Auto-tune + trimmed point-to-plane ICP (app.cpp:187-216)
        ratio = clamp_trim_ratio(overlap, cfg.trim_ratio_floor,
                                 cfg.trim_ratio_ceil)
        res = point_to_plane_icp(fpts, fmask, ref_points, ref_normals,
                                 ref_mask, se3.identity(), ratio, cfg.icp)

        # Aligned reading + rotated normals: graph storage and, on windowed
        # reference updates, the next frames' reference — computed here so a
        # reference update costs no extra dispatch or normals pass.
        aligned_pts = se3.transform_points(res.T, fpts)
        aligned_nrm = se3.rotate_vectors(res.T, fnormals)

        return AppFrameOutput(
            correction=res.T,
            overlap_percent=overlap,
            fov_overlap=fov,
            alignability=align,
            risk=risk,
            trim_ratio=ratio,
            n_iterations=res.n_iterations,
            inlier_rms=res.inlier_rms,
            hessian=res.hessian,
            filtered_points=fpts,
            filtered_mask=fmask,
            filtered_normals=fnormals,
            filtered_count=jnp.sum(fmask.astype(jnp.int32)),
            aligned_points=aligned_pts,
            aligned_normals=aligned_nrm,
        )

    return app_step


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
            out_capacity=cfg.filtered_capacity,
            method=cfg.segmentation_method,
            normal_radius=cfg.normal_radius)
        return fpts, fmask, fnormals

    return prep
