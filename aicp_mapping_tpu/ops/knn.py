"""Nearest-neighbor correspondence search.

This replaces libpointmatcher's KDTreeMatcher (reference:
aicp_core/config/icp/icp_autotuned.yaml:27-31 `KDTreeMatcher: knn: 1`) with a
TPU-native tiled brute-force search:

  dist2(i, j) = |q_i|^2 + |r_j|^2 - 2 q_i . r_j

The cross term is a matmul that runs on the MXU; the running min/argmin is
kept in VMEM while reference tiles stream through. Points are handled in
structure-of-arrays layout (3, N) inside the kernel so the innermost
dimension is lane-aligned (128).

Two entry points:
  - nn_argmin:  1-NN (ICP matching hot loop)
  - knn:        k-NN via blockwise distances + lax.top_k (normal estimation,
                reference knn=20/30: icp_autotuned.yaml:12-13,
                filteringUtils.cpp:22)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_F = 3.4e38  # python float: safe to close over inside pallas kernels
_BIG = np.float32(_BIG_F)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# bf16 split-product machinery (shared by the NN and moments kernels)
# ---------------------------------------------------------------------------

def split3_bf16(x: jax.Array):
    """Exact 3-way bf16 decomposition of f32: x == hi + mid + lo to full
    f32 mantissa width (8+8+8 >= 24 bits).

    The truncation is done by masking the low 16 mantissa bits with integer
    ops, NOT by dtype round-trips: under --xla_allow_excess_precision
    (set by the TPU runtime here) XLA may elide an f32->bf16->f32 rounding
    pair entirely, silently collapsing the split to plain bf16 (measured
    on-chip: neighborhood counts off by ~100)."""
    def trunc(v):
        b = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            b & jnp.uint32(0xFFFF0000), jnp.float32)

    hi = trunc(x)
    r1 = x - hi
    mid = trunc(r1)
    lo = r1 - mid
    # hi/mid fit bf16 exactly (low mantissa bits are zero); lo rounds once
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def cross_pack_q(pts_t: jax.Array, rows: int = 32) -> jax.Array:
    """Query-side packing for the bf16 split-product distance matmul.

    A f32-accurate q.r contraction on the MXU costs 6 bf16 passes
    (Precision.HIGHEST); instead both operands are 3-way bf16 split and the
    six leading term pairs (hh, hm, mh, hl, lh, mm) are stacked along the
    CONTRACTION axis — one K=18 bf16 matmul computes their sum exactly,
    same pass count as K=3 (one 128-wide K tile), 6x fewer MXU passes.
    Dropped terms (ml, lm, ll) are <= 2^-24 relative: ~1e-3 m^2 absolute on
    3600 m^2 products (60 m lidar coordinates) — immaterial for both the
    0.16 m^2 radius test and NN match selection. Rows are zero-padded to
    `rows` for bf16 sublane tiling."""
    h, m, l = split3_bf16(pts_t)                     # each (3, N) bf16
    q = jnp.concatenate([h, h, m, h, l, m], axis=0)  # (18, N)
    return jnp.concatenate(
        [q, jnp.zeros((rows - 18, pts_t.shape[1]), jnp.bfloat16)], axis=0)


def cross_pack_r(pts_t: jax.Array, rows: int = 32) -> jax.Array:
    """Reference-side pairing for `cross_pack_q` (hh, hm, mh, hl, lh, mm)."""
    h, m, l = split3_bf16(pts_t)
    r = jnp.concatenate([h, m, h, l, h, m], axis=0)
    return jnp.concatenate(
        [r, jnp.zeros((rows - 18, pts_t.shape[1]), jnp.bfloat16)], axis=0)


def _num_blocks(m: int, block: int) -> int:
    """Largest divisor of m not exceeding ceil(m / block) (static python)."""
    target = max(-(-m // block), 1)
    for nb in range(target, 0, -1):
        if m % nb == 0:
            return nb
    return 1


# ---------------------------------------------------------------------------
# XLA fallback (CPU tests / autodiff reference)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("block",))
def nn_argmin_xla(queries, qmask, refs, rmask, block: int = 1024):
    """Blockwise 1-NN in plain XLA. Shapes: queries (M,3), refs (N,3)."""
    M = queries.shape[0]
    r2 = jnp.sum(refs * refs, axis=-1)
    r2 = jnp.where(rmask, r2, _BIG)

    nblocks = _num_blocks(M, block)
    qb = queries.reshape(nblocks, -1, 3)

    def body(q):
        # full f32 matmul: bf16 (TPU default) loses ~14 m^2 at 60 m coords
        d = (
            jnp.sum(q * q, axis=-1)[:, None]
            - 2.0 * jnp.matmul(q, refs.T, precision=jax.lax.Precision.HIGHEST)
            + r2[None, :]
        )
        d = jnp.where(rmask[None, :], d, _BIG)
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    dists, idx = jax.lax.map(body, qb)
    dists = dists.reshape(M)
    idx = idx.reshape(M)
    dists = jnp.where(qmask, jnp.maximum(dists, 0.0), _BIG)
    idx = jnp.where(qmask, idx, 0)
    return dists, idx


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _nn_kernel(qt_ref, rt_ref, rsq_ref, dist_ref, idx_ref, *, tn: int):
    """One grid step: queries tile (3, TM) vs all refs (3, N), streaming refs
    in TN chunks. qt/rt are coordinate-major so the matmul contracts dim 0.
    """
    n = rt_ref.shape[1]
    qt = qt_ref[:]                      # (3, TM)
    q2 = jnp.sum(qt * qt, axis=0)       # (TM,)
    tm = qt.shape[1]

    def step(c, carry):
        best_d, best_i = carry
        r = rt_ref[:, pl.ds(c * tn, tn)]          # (3, TN)
        r2 = rsq_ref[0, pl.ds(c * tn, tn)]        # (TN,) includes +BIG for pad
        # (TM, TN) cross terms on the MXU.
        cross = jax.lax.dot_general(
            qt, r, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # full f32: see package
            # __init__ note on bf16 distance error at lidar coordinates
        )
        d = q2[:, None] - 2.0 * cross + r2[None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1) + c * tn
        tile_min = jnp.min(d, axis=1)
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + c * tn
        take = tile_min < best_d
        return (
            jnp.where(take, tile_min, best_d),
            jnp.where(take, tile_arg, best_i),
        )

    init = (jnp.full((tm,), _BIG_F, jnp.float32), jnp.zeros((tm,), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n // tn, step, init)
    dist_ref[0, :] = jnp.maximum(best_d, 0.0)
    idx_ref[0, :] = best_i


@partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def nn_argmin_pallas(queries, qmask, refs, rmask, tm: int = 512,
                     tn: int = 1024, interpret: bool = False):
    """1-NN via the Pallas tiled kernel. M, N must be multiples of tm, tn."""
    M, N = queries.shape[0], refs.shape[0]
    assert M % tm == 0 and N % tn == 0, (M, N, tm, tn)

    qt = queries.T.astype(jnp.float32)          # (3, M)
    rt = refs.T.astype(jnp.float32)             # (3, N)
    rsq = jnp.sum(rt * rt, axis=0)[None, :]     # (1, N)
    rsq = jnp.where(rmask[None, :], rsq, _BIG)

    dist, idx = pl.pallas_call(
        partial(_nn_kernel, tn=tn),
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((3, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((1, M), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * 3 + 4 * M * N,
            bytes_accessed=4 * (3 * M + 3 * N + 2 * M),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qt, rt, rsq)

    dist = dist.reshape(M)
    idx = idx.reshape(M)
    dist = jnp.where(qmask, dist, _BIG)
    idx = jnp.where(qmask, idx, 0)
    return dist, idx


def _nn_payload_kernel(qt_ref, rt_ref, rsq_ref, pay_ref, dist_ref, pout_ref,
                       *, tn: int):
    """1-NN + payload selection in one pass: alongside the running argmin,
    carry the argmin's payload row (e.g. ref point + normal), selected
    in-VMEM via a one-hot matmul — no post-hoc HBM gather.
    """
    n = rt_ref.shape[1]
    p_dim = pay_ref.shape[0]
    qt = qt_ref[:]                      # (3, TM)
    q2 = jnp.sum(qt * qt, axis=0)       # (TM,)
    tm = qt.shape[1]

    def step(c, carry):
        best_d, best_p = carry
        r = rt_ref[:, pl.ds(c * tn, tn)]          # (3, TN)
        r2 = rsq_ref[0, pl.ds(c * tn, tn)]        # (TN,)
        cross = jax.lax.dot_general(
            qt, r, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = q2[:, None] - 2.0 * cross + r2[None, :]
        tile_min = jnp.min(d, axis=1)                       # (TM,)
        arg = jnp.argmin(d, axis=1).astype(jnp.int32)       # (TM,)
        col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
        onehot = (col == arg[:, None]).astype(jnp.float32)  # (TM, TN)
        pay = pay_ref[:, pl.ds(c * tn, tn)]                 # (P, TN)
        # (P, TM) payload of each row's tile-argmin, on the MXU. One-hot
        # rows make this an exact selection even at HIGHEST precision.
        sel = jax.lax.dot_general(
            pay, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        take = tile_min < best_d
        return (
            jnp.where(take, tile_min, best_d),
            jnp.where(take[None, :], sel, best_p),
        )

    init = (jnp.full((tm,), _BIG_F, jnp.float32),
            jnp.zeros((p_dim, tm), jnp.float32))
    best_d, best_p = jax.lax.fori_loop(0, n // tn, step, init)
    dist_ref[0, :] = jnp.maximum(best_d, 0.0)
    pout_ref[:, :] = best_p


def _nn_payload_packed_kernel(qt_ref, rt_ref, rsq_ref, pay_ref, dist_ref,
                              pout_ref, *, tn: int):
    """Packed-key variant of `_nn_payload_kernel`: ONE lane-min reduction per
    chunk instead of three (min + argmin + onehot compare against the arg).

    The non-negative squared distance is bitcast to int32 (monotonic for
    non-negative IEEE floats), its low 10 mantissa bits are replaced by the
    chunk-local column id, and a single `min` over the packed keys yields
    both the winner's distance and its column; the payload one-hot compares
    keys, which are unique per chunk because columns are. Distances are
    thereby quantized to 13 effective mantissa bits for the comparison —
    ~1e-4 relative, far below matching-relevant differences; ties inside
    the quantum break toward the lower column, and the reported distance is
    the quantization floor of the true one.
    """
    p_dim = pay_ref.shape[0]
    qt = qt_ref[:]                      # (3, TM)
    q2 = jnp.sum(qt * qt, axis=0)       # (TM,)
    tm = qt.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)

    def step(c, carry):
        best_k, best_p = carry
        r = rt_ref[:, pl.ds(c * tn, tn)]          # (3, TN)
        r2 = rsq_ref[0, pl.ds(c * tn, tn)]        # (TN,)
        cross = jax.lax.dot_general(
            qt, r, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = jnp.maximum(q2[:, None] - 2.0 * cross + r2[None, :], 0.0)
        key = (jax.lax.bitcast_convert_type(d, jnp.int32)
               & jnp.int32(~1023)) | col                     # (TM, TN)
        bk = jnp.min(key, axis=1)                            # (TM,)
        onehot = (key == bk[:, None]).astype(jnp.float32)    # exactly 1 hot
        pay = pay_ref[:, pl.ds(c * tn, tn)]                  # (P, TN)
        sel = jax.lax.dot_general(
            pay, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        take = bk < best_k
        return (
            jnp.minimum(bk, best_k),
            jnp.where(take[None, :], sel, best_p),
        )

    # int32 bit pattern of _BIG_F (Mosaic bitcast is vector-only)
    big_key = 2139081118
    init = (jnp.full((tm,), big_key, jnp.int32),
            jnp.zeros((p_dim, tm), jnp.float32))
    best_k, best_p = jax.lax.fori_loop(0, rt_ref.shape[1] // tn, step, init)
    dist_ref[0, :] = jax.lax.bitcast_convert_type(
        best_k & jnp.int32(~1023), jnp.float32)
    pout_ref[:, :] = best_p


def _nn_payload_split_kernel(qsq_ref, q32_ref, r32_ref, rsq_ref, pay3_ref,
                             dist_ref, pout_ref, *, tn: int, p_dim: int):
    """bf16-split variant of `_nn_payload_packed_kernel`: the distance
    matmul contracts the 6-pair split packing (`cross_pack_q`) and the
    payload selection runs the 3-way-split payload (3P rows) against the
    EXACT bf16 one-hot — 6x fewer MXU passes at f32-equivalent output
    accuracy (~1e-3 m^2 absolute distance wobble at 60 m coordinates,
    below the packed-key quantization already accepted here)."""
    q32 = q32_ref[:]                    # (32, TM) bf16
    q2 = qsq_ref[0, :]                  # (TM,) f32
    tm = q32.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)

    def step(c, carry):
        best_k, best_p = carry
        r32 = r32_ref[:, pl.ds(c * tn, tn)]       # (32, TN) bf16
        r2 = rsq_ref[0, pl.ds(c * tn, tn)]        # (TN,) f32
        # DEFAULT precision explicitly: the package-wide f32 matmul default
        # would ask Mosaic for an fp32 contraction on bf16 operands (fails
        # to lower); bf16 x bf16 -> f32 is exact per product here
        cross = jax.lax.dot_general(
            q32, r32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        d = jnp.maximum(q2[:, None] - 2.0 * cross + r2[None, :], 0.0)
        key = (jax.lax.bitcast_convert_type(d, jnp.int32)
               & jnp.int32(~1023)) | col
        bk = jnp.min(key, axis=1)
        onehot = (key == bk[:, None]).astype(jnp.bfloat16)  # exact 0/1
        pay = pay3_ref[:, pl.ds(c * tn, tn)]                # (3P, TN) bf16
        sel3 = jax.lax.dot_general(
            pay, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                                    # (3P, TM)
        sel = (sel3[0:p_dim] + sel3[p_dim:2 * p_dim]
               + sel3[2 * p_dim:3 * p_dim])
        take = bk < best_k
        return (
            jnp.minimum(bk, best_k),
            jnp.where(take[None, :], sel, best_p),
        )

    big_key = 2139081118   # int32 bits of 3.4e38
    init = (jnp.full((tm,), big_key, jnp.int32),
            jnp.zeros((p_dim, tm), jnp.float32))
    best_k, best_p = jax.lax.fori_loop(0, r32_ref.shape[1] // tn, step, init)
    dist_ref[0, :] = jax.lax.bitcast_convert_type(
        best_k & jnp.int32(~1023), jnp.float32)
    pout_ref[:, :] = best_p


@partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def nn_payload_pallas_split(queries, qmask, refs, rmask, payload,
                            tm: int = 512, tn: int = 1024,
                            interpret: bool = False):
    """1-NN with fused payload pickup via the bf16 split-product kernel —
    same contract as `nn_payload_pallas`, ~2.5x faster on the MXU."""
    M, N = queries.shape[0], refs.shape[0]
    P = payload.shape[1]
    assert M % tm == 0 and N % tn == 0 and P % 8 == 0, (M, N, P, tm, tn)

    qt = queries.T.astype(jnp.float32)          # (3, M)
    rt = refs.T.astype(jnp.float32)             # (3, N)
    qsq = jnp.sum(qt * qt, axis=0)[None, :]     # (1, M)
    rsq = jnp.sum(rt * rt, axis=0)[None, :]     # (1, N)
    rsq = jnp.where(rmask[None, :], rsq, _BIG)
    q32 = cross_pack_q(qt)                      # (32, M) bf16
    r32 = cross_pack_r(rt)                      # (32, N) bf16
    ph, pm, plo = split3_bf16(payload.T.astype(jnp.float32))
    pay3 = jnp.concatenate([ph, pm, plo], axis=0)   # (3P, N) bf16

    dist, pout = pl.pallas_call(
        partial(_nn_payload_split_kernel, tn=tn, p_dim=P),
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((1, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, tm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * P, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((P, M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * (32 + 3 * P) // 6 + 4 * M * N,
            bytes_accessed=2 * (32 * (M + N) + 3 * P * N) + 4 * (2 * M + N),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qsq, q32, r32, rsq, pay3)

    dist = dist.reshape(M)
    dist = jnp.where(qmask, dist, _BIG)
    pout = jnp.where(qmask[None, :], pout, 0.0)
    return dist, pout.T


@partial(jax.jit, static_argnames=("tm", "tn", "packed", "interpret"))
def nn_payload_pallas(queries, qmask, refs, rmask, payload, tm: int = 512,
                      tn: int = 1024, packed: bool = True,
                      interpret: bool = False):
    """1-NN with fused payload pickup.

    payload: (N, P) per-reference row (P must be a multiple of 8 for clean
    sublane tiling; pad with zeros). Returns (dist2 (M,), payload (M, P)) —
    the payload row of each query's nearest reference. Replaces the
    `refs[idx]` / `normals[idx]` HBM gathers in the ICP inner loop.

    packed=True (default) uses the single-reduction packed-key kernel
    (~2x faster; distances quantized to ~1e-4 relative, ties broken by
    column instead of first-hit — immaterial for ICP matching).
    """
    M, N = queries.shape[0], refs.shape[0]
    P = payload.shape[1]
    assert M % tm == 0 and N % tn == 0 and P % 8 == 0, (M, N, P, tm, tn)

    qt = queries.T.astype(jnp.float32)          # (3, M)
    rt = refs.T.astype(jnp.float32)             # (3, N)
    rsq = jnp.sum(rt * rt, axis=0)[None, :]     # (1, N)
    rsq = jnp.where(rmask[None, :], rsq, _BIG)
    pay = payload.T.astype(jnp.float32)         # (P, N)

    kernel = _nn_payload_packed_kernel if packed else _nn_payload_kernel
    dist, pout = pl.pallas_call(
        partial(kernel, tn=tn),
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((3, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((P, M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * (3 + P) + 4 * M * N,
            bytes_accessed=4 * (3 * M + (3 + P) * N + (1 + P) * M),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qt, rt, rsq, pay)

    dist = dist.reshape(M)
    dist = jnp.where(qmask, dist, _BIG)
    pout = jnp.where(qmask[None, :], pout, 0.0)
    return dist, pout.T


def nn_payload_xla(queries, qmask, refs, rmask, payload, block: int = 1024):
    """XLA fallback for nn_payload_pallas (gather after argmin)."""
    dist, idx = nn_argmin_xla(queries, qmask, refs, rmask, block=block)
    pout = payload[idx]
    pout = jnp.where(qmask[:, None], pout, 0.0)
    return dist, pout


def nn_argmin(queries, qmask, refs, rmask):
    """1-NN: returns (dist2 (M,), index (M,) into refs). Dispatches to the
    Pallas kernel on TPU when shapes are tile-aligned, else XLA fallback."""
    M, N = queries.shape[0], refs.shape[0]
    if _on_tpu() and M % 512 == 0 and N % 1024 == 0:
        return nn_argmin_pallas(queries, qmask, refs, rmask)
    return nn_argmin_xla(queries, qmask, refs, rmask)


# ---------------------------------------------------------------------------
# k-NN (blockwise + top_k)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k", "block", "approx"))
def knn(queries, qmask, refs, rmask, k: int, block: int = 512,
        approx: bool = False):
    """k smallest-distance neighbors. Returns (dist2 (M,k), idx (M,k)).

    Blockwise full distance rows + top_k. With approx=True uses the TPU's
    hardware-accelerated `jax.lax.approx_min_k` (PartialReduce) — much
    faster, ~0.95 recall; appropriate for normal-estimation and
    region-growing neighborhoods where approximate neighbors are fine.
    Invalid refs get +BIG distance; invalid queries return idx 0 / dist BIG.
    """
    M = queries.shape[0]
    r2 = jnp.sum(refs * refs, axis=-1)
    r2 = jnp.where(rmask, r2, _BIG)
    nblocks = _num_blocks(M, block)
    qb = queries.reshape(nblocks, -1, 3)

    def body(q):
        d = (jnp.sum(q * q, axis=-1)[:, None]
             - 2.0 * jnp.matmul(q, refs.T,
                                precision=jax.lax.Precision.HIGHEST)
             + r2[None, :])
        d = jnp.where(rmask[None, :], d, _BIG)
        if approx:
            nd, idx = jax.lax.approx_min_k(d, k)
        else:
            neg, idx = jax.lax.top_k(-d, k)
            nd = -neg
        return jnp.maximum(nd, 0.0), idx.astype(jnp.int32)

    dists, idx = jax.lax.map(body, qb)
    dists = dists.reshape(M, k)
    idx = idx.reshape(M, k)
    dists = jnp.where(qmask[:, None], dists, _BIG)
    idx = jnp.where(qmask[:, None], idx, 0)
    return dists, idx
