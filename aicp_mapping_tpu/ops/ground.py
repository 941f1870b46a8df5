"""Progressive morphological ground filter (Zhang et al., TGRS 2003).

TPU-native re-design of the PCL `ProgressiveMorphologicalFilter` the
reference uses for KITTI preprocessing
(aicp_lcm/src/tools/pcl_ground_removal.cpp:51-56: max_window 1, slope 0.1,
initial_distance 0.1, max_distance 2.0). Instead of per-point neighborhood
queries, the cloud is rasterized to a fixed min-z grid and the morphological
opening runs as `lax.reduce_window` min/max passes — fully shape-static and
vectorized, so XLA maps it onto the VPU.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.float32(1e30)


@dataclasses.dataclass(frozen=True)
class GroundFilterConfig:
    cell_size: float = 0.33      # PCL default cell size (meters)
    grid_dim: int = 256          # static raster resolution (grid covers
                                 # grid_dim * cell_size meters per side)
    max_window_size: int = 33    # largest opening window (cells)
    slope: float = 0.1
    initial_distance: float = 0.1
    max_distance: float = 2.0
    base: float = 2.0            # window growth: w_k = 2*base^k + 1


def _window_sizes(cfg: GroundFilterConfig) -> list[int]:
    sizes = []
    k = 0
    while True:
        w = int(2 * cfg.base ** k + 1)
        if w > cfg.max_window_size:
            break
        sizes.append(w)
        k += 1
    return sizes or [3]


def _erode(grid: jax.Array, w: int) -> jax.Array:
    return -jax.lax.reduce_window(-grid, -_BIG, jax.lax.max,
                                  (w, w), (1, 1), "SAME")


def _dilate(grid: jax.Array, w: int) -> jax.Array:
    return jax.lax.reduce_window(grid, -_BIG, jax.lax.max,
                                 (w, w), (1, 1), "SAME")


@partial(jax.jit, static_argnames=("cfg",))
def ground_mask(points: jax.Array, mask: jax.Array,
                cfg: GroundFilterConfig = GroundFilterConfig()) -> jax.Array:
    """Returns a boolean (N,) mask that is True for ground points.

    Padded (mask=False) points are always classified non-ground.
    """
    pts = points
    # center the raster on the masked centroid
    m_f = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m_f), 1.0)
    center = jnp.sum(pts[:, :2] * m_f[:, None], axis=0) / denom
    half = cfg.grid_dim * cfg.cell_size / 2.0

    ij = jnp.floor((pts[:, :2] - center + half) / cfg.cell_size).astype(jnp.int32)
    in_grid = (mask & (ij[:, 0] >= 0) & (ij[:, 0] < cfg.grid_dim)
               & (ij[:, 1] >= 0) & (ij[:, 1] < cfg.grid_dim))
    ij = jnp.clip(ij, 0, cfg.grid_dim - 1)
    flat = ij[:, 0] * cfg.grid_dim + ij[:, 1]

    # min-z raster; empty cells hold +BIG
    z = jnp.where(in_grid, pts[:, 2], _BIG)
    surface = jnp.full((cfg.grid_dim * cfg.grid_dim,), _BIG, jnp.float32)
    surface = surface.at[flat].min(z)
    surface = surface.reshape(cfg.grid_dim, cfg.grid_dim)
    # fill empty cells with a large opening of the occupied surface so the
    # morphology is not polluted by +BIG holes
    filled = _dilate(jnp.where(surface < _BIG / 2, surface, -_BIG), 5)
    surface = jnp.where(surface < _BIG / 2, surface, filled)

    # progressive opening: growing windows, per-stage elevation thresholds
    # dh_k = slope * (w_k - w_{k-1}) * cell + initial, capped at max
    # (Zhang'03 eq. 7; PCL ProgressiveMorphologicalFilter::extract)
    ground_surf = surface
    prev_w = 1
    for w in _window_sizes(cfg):
        opened = _dilate(_erode(ground_surf, w), w)
        dh = jnp.minimum(
            cfg.slope * (w - prev_w) * cfg.cell_size + cfg.initial_distance,
            cfg.max_distance)
        ground_surf = jnp.where(ground_surf - opened > dh, opened, ground_surf)
        prev_w = w

    # point classification against the estimated ground surface
    surf_at = ground_surf.reshape(-1)[flat]
    is_ground = in_grid & (pts[:, 2] - surf_at <= cfg.initial_distance +
                           cfg.slope * cfg.cell_size)
    return is_ground


def remove_ground(points: jax.Array, mask: jax.Array,
                  cfg: GroundFilterConfig = GroundFilterConfig()):
    """Returns (non_ground_mask, ground_mask) — both subsets of `mask`.

    Mirrors the extract/extract-negative pair of the reference tool
    (pcl_ground_removal.cpp:58-80)."""
    g = ground_mask(points, mask, cfg)
    return mask & ~g, g
