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


def _pre_voxelized(cfg: PipelineConfig, n_points: int) -> bool:
    """True when an input cloud of static size `n_points` already went
    through the host wire voxel filter (PipelineConfig.wire_voxel at a leaf
    >= the device voxel size): the device voxel stage would be a no-op
    re-bucketing, so it is skipped (~1 ms/frame on chip). Raw full-capacity
    clouds (n_points > downsample_capacity) always voxelize on device — the
    check is shape-static, so one App serves both wire and raw uploads."""
    return (0.0 < cfg.voxel_size <= cfg.wire_voxel
            and n_points <= cfg.downsample_capacity)


def make_frame_step(cfg: PipelineConfig):
    """Returns a jitted fn:
    (reading_points, reading_mask, reading_viewpoint,
     ref_points, ref_normals, ref_mask, init_T) -> FusedFrameOutput
    """

    @jax.jit
    def frame_step(reading_points, reading_mask, reading_viewpoint,
                   ref_points, ref_normals, ref_mask, init_T):
        # Pre-filter: voxel 0.08 + planes-only (filteringUtils.cpp:5-45)
        if _pre_voxelized(cfg, reading_points.shape[0]):
            dpts, dmask = reading_points, reading_mask
        else:
            dpts, dmask = voxel_downsample(
                reading_points, reading_mask,
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

    correction: jax.Array       # (4, 4) GATED: identity when risk/accept fail
    correction_raw: jax.Array   # (4, 4) the ICP solution before gating
    risk_ok: jax.Array          # bool: risk gate passed (app.cpp:243-245)
    accepted: jax.Array         # bool: accept gate passed (app.cpp:366-373)
    new_total: jax.Array        # (4, 4) correction @ prev_total — the total
    #                             correction chain, composed on device so the
    #                             next frame can dispatch without a host sync
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
    aligned_points: jax.Array   # (F, 3) gated-correction @ filtered
    aligned_normals: jax.Array  # (F, 3) rotated normals (next reference)


def make_app_frame_step(cfg: PipelineConfig, with_risk: bool,
                        with_classifier: bool):
    """The App's whole per-frame hot block as ONE jit (app.cpp:218-247 is one
    unit in the reference too): debug pre-transform -> prefilter -> occupancy
    overlap -> [FOV overlap -> alignability -> classifier] -> auto-tune ->
    trimmed point-to-plane ICP -> gates -> total-correction chaining ->
    aligned outputs.

    The risk gate (app.cpp:243-245), the accept gate (app.cpp:366-373) and
    the total-correction composition (initialT_, app.cpp:414) all run ON
    DEVICE: computing ICP unconditionally and discarding its result is
    cheaper than a mid-frame sync, and chaining `new_total` on device means
    the NEXT frame's dispatch needs no host round-trip at all — the host can
    consume a frame's scalars one frame late (App.submit_cloud), exactly how
    the reference consumes corrections asynchronously (app_ros.cpp:68-149
    publishes poses without ever blocking on registration).

    Signature:
      (raw_points, raw_mask, odom_pose, prev_total, ref_points, ref_normals,
       ref_mask, ref_pose, fixed_overlap, allow_large,
       clf_w, clf_b, clf_mean, clf_std)
      -> AppFrameOutput

    odom_pose is the reading's raw prior (state-estimator) pose; in debug
    working mode the accumulated correction `prev_total` is integrated into
    the reading on device (setAndFilterReading, app.cpp:86-96). fixed_overlap
    >= 0 overrides the computed overlap (prior-map mode pins it at 50.0,
    app.cpp:123-127). allow_large (bool scalar) exempts the frame from the
    correction-magnitude accept gate: the reference gates only when the graph
    already has clouds (app.cpp:369 checks getNbClouds() != 0), so the FIRST
    registration — relocalizing in a prior/loaded map, where the initial
    offset is legitimately large — must never be zeroed on device.
    """
    debug_mode = cfg.working_mode != "robot"
    risk_threshold = float(cfg.risk_threshold)
    max_corr = float(cfg.max_correction_magnitude)
    eye4 = jnp.eye(4, dtype=jnp.float32)

    @jax.jit
    def app_step(raw_points, raw_mask, odom_pose, prev_total,
                 ref_points, ref_normals, ref_mask, ref_pose,
                 fixed_overlap, allow_large,
                 clf_w, clf_b, clf_mean, clf_std):
        if debug_mode:
            pre_T = prev_total
            read_pose = prev_total @ odom_pose
            pts = se3.transform_points(pre_T, raw_points)
        else:
            read_pose = odom_pose
            pts = raw_points
        viewpoint = read_pose[:3, 3]

        # Pre-filter: voxel + planes-only (filteringUtils.cpp:5-45).
        # Wire-voxelized clouds (host native pre-downsample) skip the
        # device re-voxelization; the debug-mode rigid transform above only
        # shifts bucket boundaries of an already-uniform cloud.
        if _pre_voxelized(cfg, raw_points.shape[0]):
            dpts, dmask = pts, raw_mask
        else:
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

        # Gates, on device. Risk gate: discard the correction, trust
        # odometry for one step (app.cpp:243-245, 401-411). Accept gate:
        # any axis of the correction translation over the magnitude cap
        # means WRONG ALIGNMENT -> frame dropped (app.cpp:366-373).
        risk_ok = (jnp.bool_(True) if not with_risk
                   else risk <= jnp.float32(risk_threshold))
        if cfg.min_overlap_percent > 0.0:
            # direct overlap gate (PipelineConfig.min_overlap_percent):
            # same skip + forced-reference semantics as high risk
            risk_ok = jnp.logical_and(
                risk_ok,
                overlap >= jnp.float32(cfg.min_overlap_percent))
        corr_g = jnp.where(risk_ok, res.T, eye4)
        accepted = jnp.logical_or(
            jnp.asarray(allow_large, jnp.bool_),
            jnp.all(jnp.abs(corr_g[:3, 3]) <= jnp.float32(max_corr)))
        corr_f = jnp.where(accepted, corr_g, eye4)

        # Aligned reading + rotated normals: graph storage and, on windowed
        # reference updates, the next frames' reference — computed here so a
        # reference update costs no extra dispatch or normals pass. Uses the
        # GATED correction, so a risk-gated frame's "aligned" cloud is its
        # filtered cloud (the forced-reference-update semantics).
        aligned_pts = se3.transform_points(corr_f, fpts)
        aligned_nrm = se3.rotate_vectors(corr_f, fnormals)

        return AppFrameOutput(
            correction=corr_f,
            correction_raw=res.T,
            risk_ok=risk_ok,
            accepted=accepted,
            new_total=corr_f @ prev_total,
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
        if _pre_voxelized(cfg, points.shape[0]):
            dpts, dmask = points, mask
        else:
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
