"""Masked quantiles on padded arrays.

Used by the trimmed-distance outlier filter (libpointmatcher
TrimmedDistOutlierFilter, icp_autotuned.yaml:33-35: keep the `ratio`
fraction of matches with smallest distance) and by the ICP quality monitor
(icpMonitor.cpp quantile statistics).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.float32(3.4e38)


@jax.jit
def masked_quantile(values: jax.Array, mask: jax.Array, q) -> jax.Array:
    """Quantile over valid entries only; q in [0, 1] may be traced.

    Sorts once (invalid entries to +inf) and gathers at the index
    ceil(q * n_valid) - 1 clamped to [0, n_valid-1], i.e. the smallest value
    v such that at least q * n_valid values are <= v — the same "keep ratio
    fraction" semantics as the trimmed filter.
    """
    v = jnp.where(mask, values, _BIG)
    sv = jnp.sort(v)
    n = jnp.sum(mask.astype(jnp.int32))
    pos = jnp.ceil(q * n.astype(jnp.float32)).astype(jnp.int32) - 1
    pos = jnp.clip(pos, 0, jnp.maximum(n - 1, 0))
    return sv[pos]


@partial(jax.jit, static_argnames=("bins", "rounds", "axis_name"))
def masked_quantile_hist(values: jax.Array, mask: jax.Array, q,
                         bins: int = 128, rounds: int = 2,
                         axis_name: str | None = None) -> jax.Array:
    """Approximate masked quantile via iterative range-narrowing histograms.

    Each round counts values against `bins` evenly spaced edges with one
    (N, bins) comparison + column sum — no sort, no scatter — and narrows
    the search interval to the bracketing bin. Two rounds resolve the
    threshold to (range / bins^2), far below what the trimmed-distance
    filter is sensitive to; the ICP hot loop uses this instead of the
    O(N log N) sort (~7x faster at 8k points on TPU).

    With `axis_name` (inside shard_map over point-sharded values) the
    valid count, range max and per-round bin counts are psum/pmax-reduced,
    so every shard converges on the same GLOBAL quantile — the collective
    payload is `rounds` histograms of `bins` floats per call, never the
    values themselves.
    """

    def preduce(x):
        return x if axis_name is None else jax.lax.psum(x, axis_name)

    n = preduce(jnp.sum(mask.astype(jnp.float32)))
    target = jnp.ceil(q * n)
    lo = jnp.float32(0.0)
    hi = jnp.max(jnp.where(mask, values, -_BIG))
    if axis_name is not None:
        hi = jax.lax.pmax(hi, axis_name)
    hi = jnp.maximum(hi, 1e-12)
    vm = jnp.where(mask, values, _BIG)
    for _ in range(rounds):
        edges = lo + (hi - lo) * jnp.linspace(1.0 / bins, 1.0, bins)
        # counts[b] = #values <= edges[b]  (cumulative by construction)
        counts = preduce(jnp.sum(vm[:, None] <= edges[None, :], axis=0,
                                 dtype=jnp.float32))
        meets = counts >= target
        b = jnp.argmax(meets)                  # first bracketing bin
        b = jnp.where(jnp.any(meets), b, bins - 1)
        width = (hi - lo) / bins
        new_lo = lo + width * b.astype(jnp.float32)
        hi = new_lo + width
        lo = jnp.where(b > 0, new_lo, lo)
    return hi


@jax.jit
def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    w = mask.astype(values.dtype)
    return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1.0)


@jax.jit
def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    return masked_quantile(values, mask, 0.5)


@jax.jit
def masked_max(values: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.max(jnp.where(mask, values, -_BIG))
