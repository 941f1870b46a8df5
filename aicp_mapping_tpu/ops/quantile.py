"""Masked quantiles on padded arrays.

Used by the trimmed-distance outlier filter (libpointmatcher
TrimmedDistOutlierFilter, icp_autotuned.yaml:33-35: keep the `ratio`
fraction of matches with smallest distance) and by the ICP quality monitor
(icpMonitor.cpp quantile statistics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.4e38)


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
