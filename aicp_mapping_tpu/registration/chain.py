"""ICP-chain data-points filters — libpointmatcher chain analogs.

The reference configures per-chain reading/reference pre-filters in its ICP
YAMLs (e.g. `config/icp/Besl92_pt2point.yaml`: MinDistDataPointsFilter +
RandomSamplingDataPointsFilter; `Chen91_pt2plane.yaml` adds a surface-normal
sampling stage). In the rebuild these are shape-static mask updates — points
are never compacted, only invalidated — so the same jitted ICP kernel serves
every chain without recompiling.

All filters take/return a boolean validity mask over a fixed-capacity point
tensor (the padded-cloud convention, SURVEY.md §7 "Dynamic shapes").
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ChainFilterConfig:
    """Per-chain point filters (libpointmatcher DataPointsFilters analogs).

    min_dist: MinDistDataPointsFilter — drop points closer than this to the
        sensor origin (meters; 0 disables). Besl92_pt2point.yaml:2-4.
    max_dist: MaxDistDataPointsFilter — drop points farther than this
        (meters; 0 disables).
    random_sampling_prob: RandomSamplingDataPointsFilter — keep each point
        with this probability (1 disables). Besl92_pt2point.yaml:5-6.
    max_density: MaxDensityDataPointsFilter analog — voxel-stratified cap on
        local density: at most one point per `max_density_cell` meter cell
        (0 disables). icp_3D_cfg_trimmed.yaml:5-6 semantics.
    """

    min_dist: float = 0.0
    max_dist: float = 0.0
    random_sampling_prob: float = 1.0
    max_density_cell: float = 0.0


def min_dist_filter(points: jax.Array, mask: jax.Array,
                    origin: jax.Array, min_dist: float) -> jax.Array:
    """MinDistDataPointsFilter: invalidate points within `min_dist` of the
    sensor origin (Besl92_pt2point.yaml MinDistDataPointsFilter)."""
    d2 = jnp.sum((points - origin[None, :]) ** 2, axis=-1)
    return mask & (d2 >= jnp.float32(min_dist) ** 2)


def max_dist_filter(points: jax.Array, mask: jax.Array,
                    origin: jax.Array, max_dist: float) -> jax.Array:
    """MaxDistDataPointsFilter: invalidate points beyond `max_dist`."""
    d2 = jnp.sum((points - origin[None, :]) ** 2, axis=-1)
    return mask & (d2 <= jnp.float32(max_dist) ** 2)


def random_sampling_filter(mask: jax.Array, prob: float,
                           seed: int = 0) -> jax.Array:
    """RandomSamplingDataPointsFilter: keep each valid point with
    probability `prob` (deterministic given `seed` — replay-stable)."""
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (mask.shape[0],))
    return mask & (u < jnp.float32(prob))


def max_density_filter(points: jax.Array, mask: jax.Array,
                       cell_size: float) -> jax.Array:
    """MaxDensityDataPointsFilter analog: keep at most one point per
    `cell_size` voxel (stratified thinning — bounds local density the way
    the reference's density cap does, without per-point density estimates).

    Shape-static: sort by voxel key, keep the first point of each run.
    """
    n = points.shape[0]
    inv = 1.0 / jnp.float32(cell_size)
    q = jnp.floor(points * inv).astype(jnp.int32)
    sentinel = jnp.int32(2**31 - 1)  # padding sorts last
    q = jnp.where(mask[:, None], q, sentinel)
    # lexicographic sort on (x, y, z) cell coords — int32-safe (no x64)
    order = jnp.lexsort((q[:, 2], q[:, 1], q[:, 0]))
    qs = q[order]
    first = jnp.concatenate([jnp.array([True]),
                             jnp.any(qs[1:] != qs[:-1], axis=1)])
    keep_sorted = first & (qs[:, 0] != sentinel)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return mask & keep


def apply_chain_filters(points: jax.Array, mask: jax.Array,
                        origin: jax.Array, cfg: ChainFilterConfig,
                        seed: int = 0) -> jax.Array:
    """Apply the chain's DataPointsFilters in reference order
    (min/max-dist -> density cap -> random sampling)."""
    if cfg.min_dist > 0:
        mask = min_dist_filter(points, mask, origin, cfg.min_dist)
    if cfg.max_dist > 0:
        mask = max_dist_filter(points, mask, origin, cfg.max_dist)
    if cfg.max_density_cell > 0:
        mask = max_density_filter(points, mask, cfg.max_density_cell)
    if cfg.random_sampling_prob < 1.0:
        mask = random_sampling_filter(mask, cfg.random_sampling_prob, seed)
    return mask
