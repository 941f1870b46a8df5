"""Point-sharded distributed ICP over a device mesh.

The multi-chip compute path for registration (SURVEY.md §2.12-bis, §5.7):
reading points are sharded along the point axis across devices, the reference
cloud is replicated, and each ICP iteration reduces the 6x6 normal equations
(and the trim histograms) with `psum` over ICI — the "psum of per-block
Hessians" scheme from BASELINE.json. The transform stays replicated so the
`lax.while_loop` control flow is identical on every device.

This is a thin shard_map shell: the solver is the SAME
`registration.icp.point_to_plane_icp` that runs single-device — with
`config.axis_name` set it psum-reduces its global reductions, so every fast
path (fused Pallas NN+payload kernels, Morton-banded map-scale windows,
point-to-point metric, max-dist rejection) runs shard-local per chip. The
trimmed-distance threshold needs a *global* quantile across shards; a sorted
quantile would require an all-gather of distances, so the solver's
histogram quantile psum-reduces its bin counts instead (exact to bin
resolution — the outlier trim is robust to that). Per ICP iteration the
collective payload is 2x128 histogram bins + the 6x6 system + 6-vector:
~1.2 KiB, independent of point count.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..registration.icp import ICPConfig, ICPResult, point_to_plane_icp


def histogram_quantile(values, weights, q, lo, hi, axis_name=None,
                       bins: int = 512):
    """Weighted quantile via a fixed-bin histogram on [lo, hi].

    With `axis_name`, the histogram is psum-reduced so every shard returns
    the same global threshold. (The ICP hot loop uses the iterative
    range-narrowing `ops.quantile.masked_quantile_hist` instead; this
    fixed-range variant serves the pose-graph / monitor utilities.)
    """
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((values - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[idx].add(weights)
    if axis_name is not None:
        hist = jax.lax.psum(hist, axis_name)
    cdf = jnp.cumsum(hist)
    total = jnp.maximum(cdf[-1], 1e-12)
    # smallest bin whose cdf >= q * total; threshold = right bin edge
    target = q * total
    bin_i = jnp.argmax(cdf >= target)
    return lo + (bin_i.astype(jnp.float32) + 1.0) / bins * span


def sharded_point_to_plane_icp(
    mesh: Mesh,
    reading_points, reading_mask,
    reference_points, reference_normals, reference_mask,
    init_T, trim_ratio,
    config: ICPConfig = ICPConfig(),
    axis: str = "points",
) -> ICPResult:
    """Run ICP with reading points sharded over `mesh[axis]`; reference and
    transform replicated. Returns the full ICPResult: T / n_iterations /
    inlier_rms / hessian replicated, per-point match_dist2 / inlier_mask
    sharded along the point axis."""
    n_dev = mesh.shape[axis]
    assert reading_points.shape[0] % n_dev == 0
    cfg = dataclasses.replace(config, axis_name=axis)

    out_specs = ICPResult(
        T=P(), n_iterations=P(), inlier_rms=P(),
        match_dist2=P(axis), inlier_mask=P(axis), hessian=P())

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P(), P()),
        out_specs=out_specs,
        # the Pallas NN kernels don't annotate varying-mesh-axes on their
        # out_shapes; replication of the psum-reduced outputs is guaranteed
        # by construction (identical while_loop on every shard)
        check_vma=False,
    )
    def run(rp, rm, fp, fn, fm, T0, ratio):
        return point_to_plane_icp(rp, rm, fp, fn, fm, T0, ratio, cfg)

    return run(reading_points, reading_mask, reference_points,
               reference_normals, reference_mask,
               init_T.astype(jnp.float32), jnp.float32(trim_ratio))


def map_sharded_point_to_plane_icp(
    mesh: Mesh,
    reading_points, reading_mask,
    reference_points, reference_normals, reference_mask,
    init_T, trim_ratio,
    config: ICPConfig = ICPConfig(),
    axis: str = "points",
) -> ICPResult:
    """Run ICP with the REFERENCE (map) sharded in blocks over `mesh[axis]`
    and the reading replicated — the memory-scaling layout for localization
    against maps larger than one chip's HBM (SURVEY.md 2.12-bis "map-block
    sharding"). Each shard matches the full reading against its map block
    (all single-device fast paths run block-local, including the Morton-
    banded kernels on the block's own sort); the global nearest neighbor is
    then reduced across shards with pmin + a psum payload select — ~36 B
    per reading point per iteration on ICI, independent of map size.

    Returns a fully replicated ICPResult (per-point stats are replicated
    because every shard holds the whole reading)."""
    n_dev = mesh.shape[axis]
    assert reference_points.shape[0] % n_dev == 0, (
        reference_points.shape[0], n_dev)
    cfg = dataclasses.replace(config, axis_name=axis,
                              shard_axis_mode="reference")

    out_specs = ICPResult(
        T=P(), n_iterations=P(), inlier_rms=P(),
        match_dist2=P(), inlier_mask=P(), hessian=P())

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=out_specs,
        # after the cross-shard NN reduction every value is replicated by
        # construction; the Pallas kernels don't annotate varying axes
        check_vma=False,
    )
    def run(rp, rm, fp, fn, fm, T0, ratio):
        return point_to_plane_icp(rp, rm, fp, fn, fm, T0, ratio, cfg)

    return run(reading_points, reading_mask, reference_points,
               reference_normals, reference_mask,
               init_T.astype(jnp.float32), jnp.float32(trim_ratio))
