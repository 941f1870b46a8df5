"""Point-sharded distributed ICP over a device mesh.

The multi-chip compute path for registration (SURVEY.md §2.12-bis, §5.7):
reading points are sharded along the point axis across devices, the reference
cloud is replicated, and each ICP iteration reduces the 6x6 normal equations
(and the trim histogram) with `psum` over ICI — the "psum of per-block
Hessians" scheme from BASELINE.json. The transform stays replicated so the
`lax.while_loop` control flow is identical on every device.

The trimmed-distance threshold needs a *global* quantile across shards; a
sorted quantile would require an all-gather of distances, so here it is
computed from a psum-reduced 512-bin histogram (exact to bin resolution —
the outlier trim is robust to that).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import se3
from ..ops.knn import nn_argmin_xla
from ..registration.icp import ICPConfig

_BIG = 3.4e38


def histogram_quantile(values, weights, q, lo, hi, axis_name=None,
                       bins: int = 512):
    """Weighted quantile via a fixed-bin histogram on [lo, hi].

    With `axis_name`, the histogram is psum-reduced so every shard returns
    the same global threshold.
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


def _icp_shard_body(reading_points, reading_mask, reference_points,
                    reference_normals, reference_mask, init_T, trim_ratio,
                    config: ICPConfig, axis_name: str | None):
    """ICP while_loop where per-point work is shard-local and scalars/6x6
    systems are psum-reduced. Runs unchanged on one device (axis_name=None)."""

    def preduce(x):
        return x if axis_name is None else jax.lax.psum(x, axis_name)

    m_f = reading_mask.astype(jnp.float32)
    S = config.smooth_length

    def iteration(T):
        p = se3.transform_points(T, reading_points)
        dist2, idx = nn_argmin_xla(p, reading_mask, reference_points,
                                   reference_mask)
        d_valid = jnp.where(reading_mask & (dist2 < _BIG), dist2, 0.0)
        hi = preduce(jnp.max(d_valid))
        thresh = histogram_quantile(dist2, m_f * (dist2 < _BIG), trim_ratio,
                                    0.0, hi, axis_name)
        w = m_f * (dist2 <= thresh) * (dist2 < _BIG)
        q = reference_points[idx]
        n = reference_normals[idx]
        r = jnp.sum(n * (p - q), axis=-1)
        J = jnp.concatenate([n, jnp.cross(p, n)], axis=-1)
        Jw = J * w[:, None]
        A = preduce(Jw.T @ J)
        b = preduce(-(Jw.T @ r))
        lam = config.damping * jnp.trace(A) / 6.0 + 1e-12
        delta = jnp.linalg.solve(A + lam * jnp.eye(6, dtype=A.dtype), b)
        return delta, A, dist2, w, r

    def cond(state):
        _, it, _, _, done = state
        return jnp.logical_and(it < config.max_iterations,
                               jnp.logical_not(done))

    def body(state):
        T, it, hist_t, hist_r, done = state
        delta, *_ = iteration(T)
        T_new = se3.se3_exp(delta) @ T
        dt = jnp.linalg.norm(delta[:3])
        dr = jnp.linalg.norm(delta[3:])
        hist_t = jnp.roll(hist_t, 1).at[0].set(dt)
        hist_r = jnp.roll(hist_r, 1).at[0].set(dr)
        enough = it + 1 >= S
        conv = jnp.logical_and(jnp.mean(hist_t) < config.min_diff_trans,
                               jnp.mean(hist_r) < config.min_diff_rot)
        return (T_new, it + 1, hist_t, hist_r,
                jnp.logical_and(enough, conv))

    init = (init_T.astype(jnp.float32), jnp.int32(0),
            jnp.full((S,), _BIG, jnp.float32),
            jnp.full((S,), _BIG, jnp.float32), jnp.bool_(False))
    T, n_it, _, _, _ = jax.lax.while_loop(cond, body, init)

    delta, A, dist2, w, r = iteration(T)
    rms = jnp.sqrt(preduce(jnp.sum(w * r * r))
                   / jnp.maximum(preduce(jnp.sum(w)), 1.0))
    return T, n_it, rms, A


def sharded_point_to_plane_icp(
    mesh: Mesh,
    reading_points, reading_mask,
    reference_points, reference_normals, reference_mask,
    init_T, trim_ratio,
    config: ICPConfig = ICPConfig(),
    axis: str = "points",
):
    """Run ICP with reading points sharded over `mesh[axis]`; reference and
    transform replicated. Returns (T, n_iterations, inlier_rms, hessian)."""
    n_dev = mesh.shape[axis]
    assert reading_points.shape[0] % n_dev == 0

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    def run(rp, rm, fp, fn, fm, T0, ratio):
        return _icp_shard_body(rp, rm, fp, fn, fm, T0, ratio, config, axis)

    return run(reading_points, reading_mask, reference_points,
               reference_normals, reference_mask,
               init_T.astype(jnp.float32), jnp.float32(trim_ratio))
