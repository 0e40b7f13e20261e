"""Pallas TPU flash attention (build-new component ⊕B).

Blockwise-softmax attention with O(S) memory for the two quadratic hot
spots the reference materializes in full:

* FCT's spatial attention over H*W tokens (``FCT.py:69-75`` —
  ``nn.MultiheadAttention`` over up to 16K tokens, whose S^2 logits would
  be ~1 GB at 128x128 resolution);
* the temporal attention of the recovered ``TransformerEncoder.py`` L49-61.

Design (canonical TPU flash pattern):
* grid = (B*H, q_blocks, k_blocks); the innermost grid dim iterates
  sequentially on TPU, so running max / sum / output accumulators live in
  VMEM scratch, initialized at j==0 and finalized at j==last via pl.when.
* q/k/v blocks stream HBM->VMEM through BlockSpecs (double-buffered by the
  pipeline); VMEM residency is O(block^2), independent of S.
* fp32 softmax and accumulation regardless of input dtype; MXU matmuls via
  jax.lax.dot_general with preferred_element_type=float32.
* custom VJP: forward saves the log-sum-exp; backward runs two Pallas
  kernels (dq; dk+dv) that recompute probabilities blockwise, so the
  backward is O(S) memory too.

Sequence lengths are zero-padded to block multiples with -inf masking of
the padded key columns.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on the v5e chip (benchmarks/flash_block_sweep.py, round 3): a
# wide k block wins at every shape measured — fewer grid steps along the
# streaming (k) axis amortizes the per-block pipeline overhead that
# dominates at the small head dims this repo runs (FCT's Dh 4-8, Dh 64):
# fwd 1.21-1.57x and fwd+bwd 1.19-1.26x over (512, 512). (512, 2048)
# keeps the fp32 logits block at 4 MB, inside the 16 MB scoped-VMEM
# limit with bwd scratch ((2048, 1024) OOMs it at S 16K); blocks clamp
# to S for short sequences.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 2048
NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Attention-weight dropout (TransformerEncoder.py L19/L58: Dropout(0.1) on
# the softmax weights). Flash tiles the (S, S) weight matrix, so the mask is
# generated counter-based from the GLOBAL (row, col) element index with a
# squirrel3 integer hash — bit-identical across the forward and the two
# backward kernels (which revisit the same elements on different grids) and
# across interpret/compiled modes (pltpu.prng_* has no interpret-mode
# lowering in this JAX version). O(1) memory: no (S, S) mask materialized.
# ---------------------------------------------------------------------------


def _squirrel3(x: jnp.ndarray) -> jnp.ndarray:
    """Squirrel3 avalanche hash over uint32 lanes."""
    x = x * jnp.uint32(0xB5297A4D)
    x = x ^ (x >> 8)
    x = x + jnp.uint32(0x68E31DA4)
    x = x ^ (x << 8)
    x = x * jnp.uint32(0x1B56C4E9)
    x = x ^ (x >> 8)
    return x


def _drop_threshold(rate: float) -> int:
    """uint32 threshold t: drop where hash < t, so P(drop) = t / 2^32."""
    return min(0xFFFFFFFF, max(0, int(round(rate * 4294967296.0))))


def _keep_mask(seed, bh, row0, col0, shape, rate: float) -> jnp.ndarray:
    """In-kernel keep mask for the (row0.., col0..) tile of the global
    attention-weight matrix; seed/bh are traced int32 scalars."""
    row = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0).astype(jnp.uint32)
    col = (jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0).astype(jnp.uint32)
    base = seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1) + bh.astype(
        jnp.uint32
    ) * jnp.uint32(0x85EBCA77)
    h = _squirrel3(row ^ base)
    h = _squirrel3(h + col * jnp.uint32(0x27D4EB2F))
    return h >= jnp.uint32(_drop_threshold(rate))


def attention_dropout_mask(
    seed, bh: int, s_q: int, s_k: int, rate: float
) -> jnp.ndarray:
    """Reference (full-matrix) replica of the in-kernel keep mask for one
    batch-head: (s_q, s_k) bool, True = keep. Used by parity tests to
    verify the kernels against dense attention with the identical mask."""
    seed = jnp.asarray(seed, jnp.int32).reshape(())
    row = jnp.arange(s_q, dtype=jnp.uint32)[:, None]
    col = jnp.arange(s_k, dtype=jnp.uint32)[None, :]
    base = seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1) + jnp.uint32(
        bh
    ) * jnp.uint32(0x85EBCA77)
    h = _squirrel3(jnp.broadcast_to(row, (s_q, s_k)) ^ base)
    h = _squirrel3(h + jnp.broadcast_to(col, (s_q, s_k)) * jnp.uint32(0x27D4EB2F))
    return h >= jnp.uint32(_drop_threshold(rate))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref, m_scr, l_scr,
                acc_scr, *, scale: float, seq_len: int, block_k: int,
                dropout_rate: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # (bq, dh)
    k = k_ref[0].astype(jnp.float32)  # (bk, dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)

    # Mask padded key columns (zero-padded tail of the sequence).
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < seq_len, s, NEG_INF)

    m_prev = m_scr[:]  # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)  # (bq, bk)
    alpha = jnp.exp(m_prev - m_new)  # (bq, 1)

    m_scr[:] = m_new
    # l accumulates the UNdropped sum: dropout acts on the normalized
    # weights (softmax(s)/l then mask), which equals dropping p before the
    # final division because l is dropout-independent.
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _keep_mask(
            seed_ref[0], b, i * s.shape[0], j * block_k, s.shape, dropout_rate
        )
        p = p * keep.astype(jnp.float32) / (1.0 - dropout_rate)
    v = v_ref[0].astype(jnp.float32)  # (bk, dh)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _final():
        l = l_scr[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows (padding)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(safe_l)  # (bq, 1)


def _seed_spec():
    """(1,) int32 SMEM seed input, shared by every grid step."""
    return pl.BlockSpec((1,), lambda *_: (0,), memory_space=pltpu.SMEM)


def _flash_fwd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, seed: jnp.ndarray,
    scale: float, block_q: int, block_k: int, interpret: bool,
    dropout_rate: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q,k,v: (BH, S, Dh) -> (out (BH, S, Dh), lse (BH, S))."""
    bh, s, dh = q.shape
    bq = min(block_q, max(8, s))
    bk = min(block_k, max(8, s))
    s_pad_q = _cdiv(s, bq) * bq
    s_pad_k = _cdiv(s, bk) * bk
    if s_pad_q != s:
        q = jnp.pad(q, ((0, 0), (0, s_pad_q - s), (0, 0)))
    if s_pad_k != s:
        k = jnp.pad(k, ((0, 0), (0, s_pad_k - s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad_k - s), (0, 0)))

    grid = (bh, s_pad_q // bq, s_pad_k // bk)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, seq_len=s, block_k=bk,
            dropout_rate=dropout_rate,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            _seed_spec(),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # lse rides as (BH, S, 1): a (1, bq) block over a 2-D array
            # violates Mosaic's (8, 128) min-tile rule; with a trailing
            # unit dim the block's last dim equals the array's (allowed).
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad_q, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, s_pad_q, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, seed)
    return out[:, :s], lse[:, :s, 0]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
               dq_ref, acc_scr, *, scale: float, seq_len: int, block_k: int,
               dropout_rate: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        # ds_ij = w_ij (m_ij dp_ij - delta_i): the mask rides on dp only;
        # delta = do.out already carries the dropped weights.
        keep = _keep_mask(
            seed_ref[0], b, i * s.shape[0], j * block_k, s.shape, dropout_rate
        )
        dp = dp * keep.astype(jnp.float32) / (1.0 - dropout_rate)
    ds = p * (dp - delta) * scale
    acc_scr[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _final():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *,
                scale: float, seq_len: int, block_k: int,
                dropout_rate: float):
    b = pl.program_id(0)
    i = pl.program_id(2)  # q block index (innermost)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse)  # (bq, bk)

    if dropout_rate > 0.0:
        # Same global (row, col) tile as the forward: rows are q positions
        # (block i), cols are k positions (block j).
        keep = (
            _keep_mask(
                seed_ref[0], b, i * s.shape[0], j * block_k, s.shape,
                dropout_rate,
            ).astype(jnp.float32)
            / (1.0 - dropout_rate)
        )
        p_drop = p * keep
    else:
        p_drop = p

    # dv += (dropped p)^T @ dO
    dv_scr[:] += jax.lax.dot_general(
        p_drop, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        dp = dp * keep
    ds = p * (dp - delta) * scale  # (bq, bk)
    # dk += ds^T @ q
    dk_scr[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nq - 1)
    def _final():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(
    q, k, v, seed, out, lse, do, scale: float, block_q: int, block_k: int,
    interpret: bool, dropout_rate: float,
):
    bh, s, dh = q.shape
    bq = min(block_q, max(8, s))
    bk = min(block_k, max(8, s))
    s_pad_q = _cdiv(s, bq) * bq
    s_pad_k = _cdiv(s, bk) * bk

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    def padq(x, val=0.0):
        return jnp.pad(x, ((0, 0), (0, s_pad_q - s)) + ((0, 0),) * (x.ndim - 2),
                       constant_values=val)

    def padk(x):
        return jnp.pad(x, ((0, 0), (0, s_pad_k - s)) + ((0, 0),) * (x.ndim - 2))

    # lse/delta ride as (BH, S, 1) — see the forward's out_specs comment.
    qp, dop = padq(q), padq(do)
    lsep, deltap = padq(lse[..., None], 1.0), padq(delta[..., None])
    kp, vp = padk(k), padk(v)

    q_spec = pl.BlockSpec((1, bq, dh), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, bk, dh), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, seq_len=s, block_k=bk,
                          dropout_rate=dropout_rate),
        grid=(bh, s_pad_q // bq, s_pad_k // bk),
        in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec, row_spec,
                  _seed_spec()],
        out_specs=[q_spec],
        out_shape=[jax.ShapeDtypeStruct((bh, s_pad_q, dh), q.dtype)],
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap, seed)[0][:, :s]

    # dk/dv: swap loop order — k blocks outer, q blocks inner (sequential).
    q_spec2 = pl.BlockSpec((1, bq, dh), lambda b, j, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    k_spec2 = pl.BlockSpec((1, bk, dh), lambda b, j, i: (b, j, 0),
                           memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0),
                             memory_space=pltpu.VMEM)

    def _dkv(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
             dk_ref, dv_ref, dk_scr, dv_scr):
        # program_id(1) = k block, program_id(2) = q block.
        _dkv_kernel(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
            dk_ref, dv_ref, dk_scr, dv_scr,
            scale=scale, seq_len=s, block_k=bk, dropout_rate=dropout_rate,
        )

    dk, dv = pl.pallas_call(
        _dkv,
        grid=(bh, s_pad_k // bk, s_pad_q // bq),
        in_specs=[q_spec2, k_spec2, k_spec2, q_spec2, row_spec2, row_spec2,
                  _seed_spec()],
        out_specs=[k_spec2, k_spec2],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad_k, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, s_pad_k, dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dh), jnp.float32),
            pltpu.VMEM((bk, dh), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap, seed)
    return dq, dk[:, :s], dv[:, :s]


# ---------------------------------------------------------------------------
# Banded (overlapping-window) kernels: query window i attends to key
# windows {i-1, i} — the streaming temporal pattern (BASELINE configs 2/4).
# Compute and memory are O(S * window).
#
# Round-3 redesign: GROUPED single-pass blocks. With the window as the
# block size (round 2) every grid step ran a tiny (w, Dh, w) matmul and
# per-step pipeline overhead dominated — measured on the v5e, FULL flash
# at S=4096/w=64 beat the band despite 32x the FLOPs. Each step now
# processes G = DEFAULT_BAND_ROWS//window query windows at once: one
# (G*w, Dh) q block against its (G+1)*w-column key span. The previous
# window rides as a second, w-sized block operand (so the span needs no
# unaligned loads) and is concatenated in VMEM; the span is globally
# contiguous, so the dropout mask keys stay identical to the old grid's.
# The band is enforced by masking and the softmax computed in ONE pass —
# the whole key span for a query row is resident, so there are no
# streaming accumulators and no inner grid dimension. Logit waste is
# (G+1)/(2G) vs the exact band, but the matmuls are MXU-sized.
# ---------------------------------------------------------------------------

# 256 measured best on the v5e across the fwd and fwd+bwd block_rows
# sweeps (benchmarks/band_block_sweep.py, BENCHES.md): it ties 128 at
# fwd S=4096, wins fwd+bwd per-shard by 12%, and keeps G >= 2 grouped
# windows per grid step up to window 128 (G=1 degenerates to the slow
# round-2 geometry). 512 (the round-3 initial guess) loses 8-15% fwd+bwd.
DEFAULT_BAND_ROWS = 256


def _band_geometry(s: int, window: int, block_rows: Optional[int]):
    """(G, BQ, s_pad, ng): G windows per grid step, BQ = G*window rows."""
    target = DEFAULT_BAND_ROWS if block_rows is None else block_rows
    nw = _cdiv(s, window)
    g = max(1, min(nw, target // window))
    bq = g * window
    s_pad = _cdiv(s, bq) * bq
    return g, bq, s_pad, s_pad // bq


def _band_mask(shape, row0, col0, window: int, seq_len: int):
    """Band validity for a (rows, cols) logit tile whose global element
    (r, c) is (row0 + r, col0 + c): key window == query window or the one
    before it, both indices inside the true sequence."""
    row_g = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    col_g = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
    riw = row_g // window
    kiw = col_g // window
    return (
        ((kiw == riw) | (kiw == riw - 1))
        & (col_g >= 0)
        & (col_g < seq_len)
        & (row_g < seq_len)
    )


def _band_fwd_kernel(q_ref, kp_ref, ko_ref, vp_ref, vo_ref, seed_ref, o_ref,
                     lse_ref, *, scale: float, seq_len: int, window: int,
                     dropout_rate: float):
    b = pl.program_id(0)
    gi = pl.program_id(1)
    bq = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)  # (BQ, dh)
    k = jnp.concatenate([kp_ref[0], ko_ref[0]], axis=0).astype(jnp.float32)
    v = jnp.concatenate([vp_ref[0], vo_ref[0]], axis=0).astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, w + BQ)

    row0 = gi * bq
    col0 = gi * bq - window  # key span starts one window left of the block
    valid = _band_mask(s.shape, row0, col0, window, seq_len)
    s = jnp.where(valid, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)  # finite: >= one valid col per row
    p = jnp.exp(s - m)
    p = jnp.where(valid, p, 0.0)  # all-masked pad rows: kill exp(0)=1
    l = jnp.sum(p, axis=1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref[0], b, row0, col0, s.shape, dropout_rate)
        p = p * keep.astype(jnp.float32) / (1.0 - dropout_rate)
    acc = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / safe_l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(safe_l)  # (BQ, 1)


def _band_dq_kernel(q_ref, kp_ref, ko_ref, vp_ref, vo_ref, do_ref, lse_ref,
                    delta_ref, seed_ref, dq_ref, *, scale: float,
                    seq_len: int, window: int, dropout_rate: float):
    b = pl.program_id(0)
    gi = pl.program_id(1)
    bq = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)
    k = jnp.concatenate([kp_ref[0], ko_ref[0]], axis=0).astype(jnp.float32)
    v = jnp.concatenate([vp_ref[0], vo_ref[0]], axis=0).astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (BQ, 1)
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    row0 = gi * bq
    col0 = gi * bq - window
    valid = _band_mask(s.shape, row0, col0, window, seq_len)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lse)
    p = jnp.where(valid, p, 0.0)  # pad rows carry garbage lse
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref[0], b, row0, col0, s.shape, dropout_rate)
        dp = dp * keep.astype(jnp.float32) / (1.0 - dropout_rate)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _band_dkv_kernel(qo_ref, qn_ref, k_ref, v_ref, doo_ref, don_ref,
                     lseo_ref, lsen_ref, deltao_ref, deltan_ref, seed_ref,
                     dk_ref, dv_ref, *, scale: float, seq_len: int,
                     window: int, dropout_rate: float):
    b = pl.program_id(0)
    gi = pl.program_id(1)
    bk = k_ref.shape[1]
    k = k_ref[0].astype(jnp.float32)  # (BK, dh)
    v = v_ref[0].astype(jnp.float32)
    # Contributing queries: windows [gi*G, gi*G + G] — own block plus one
    # window to the right (clamped load; right-tail rows masked below).
    qs = jnp.concatenate([qo_ref[0], qn_ref[0]], axis=0).astype(jnp.float32)
    dos = jnp.concatenate([doo_ref[0], don_ref[0]], axis=0).astype(jnp.float32)
    lses = jnp.concatenate([lseo_ref[0], lsen_ref[0]], axis=0)  # (BK+w, 1)
    deltas = jnp.concatenate([deltao_ref[0], deltan_ref[0]], axis=0)

    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BK + w, BK)
    row0 = gi * bk
    col0 = gi * bk
    valid = _band_mask(s.shape, row0, col0, window, seq_len)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lses)
    p = jnp.where(valid, p, 0.0)  # pad/clamped rows carry garbage lse

    if dropout_rate > 0.0:
        keep = (
            _keep_mask(seed_ref[0], b, row0, col0, s.shape, dropout_rate)
            .astype(jnp.float32) / (1.0 - dropout_rate)
        )
        p_drop = p * keep
    else:
        p_drop = p

    dv_ref[0] = jax.lax.dot_general(
        p_drop, dos, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        dos, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        dp = dp * keep
    ds = p * (dp - deltas) * scale
    dk_ref[0] = jax.lax.dot_general(
        ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _win_fwd(q, k, v, seed, scale: float, window: int, interpret: bool,
             dropout_rate: float, block_rows: Optional[int] = None):
    """q,k,v: (BH, S, Dh) -> (out, lse); window-banded attention."""
    bh, s, dh = q.shape
    g, bq, s_pad, ng = _band_geometry(s, window, block_rows)
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    big = pl.BlockSpec((1, bq, dh), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    # Previous-window operand in window-sized blocks (clamped at i==0;
    # masked in-kernel via col_g >= 0).
    prev = pl.BlockSpec(
        (1, window, dh),
        lambda b, i: (b, jnp.maximum(i * g - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _band_fwd_kernel, scale=scale, seq_len=s, window=window,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, ng),
        in_specs=[big, prev, big, prev, big, _seed_spec()],
        out_specs=[
            big,
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, s_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, k, v, v, seed)
    return out[:, :s], lse[:, :s, 0]


def _win_bwd(q, k, v, seed, out, lse, do, scale: float, window: int,
             interpret: bool, dropout_rate: float,
             block_rows: Optional[int] = None):
    bh, s, dh = q.shape
    g, bq, s_pad, ng = _band_geometry(s, window, block_rows)
    nw = s_pad // window
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    def pad3(x):
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))

    qp, kp, vp, dop = pad3(q), pad3(k), pad3(v), pad3(do)
    # lse/delta ride as (BH, S, 1) — Mosaic min-tile rule (see _flash_fwd).
    lsep, deltap = pad3(lse[..., None]), pad3(delta[..., None])

    big = pl.BlockSpec((1, bq, dh), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (1, window, dh),
        lambda b, i: (b, jnp.maximum(i * g - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    row_big = pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(
            _band_dq_kernel, scale=scale, seq_len=s, window=window,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, ng),
        in_specs=[big, prev, big, prev, big, big, row_big, row_big,
                  _seed_spec()],
        out_specs=[big],
        out_shape=[jax.ShapeDtypeStruct((bh, s_pad, dh), q.dtype)],
        interpret=interpret,
    )(qp, kp, kp, vp, vp, dop, lsep, deltap, seed)[0][:, :s]

    # dk/dv: same block grid over KEY blocks; contributing q span = own
    # block + one window to the right (clamped at the last window; the
    # clamped rows' global indices land past s_pad and are masked).
    nxt = pl.BlockSpec(
        (1, window, dh),
        lambda b, i: (b, jnp.minimum(i * g + g, nw - 1), 0),
        memory_space=pltpu.VMEM,
    )
    row_nxt = pl.BlockSpec(
        (1, window, 1),
        lambda b, i: (b, jnp.minimum(i * g + g, nw - 1), 0),
        memory_space=pltpu.VMEM,
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _band_dkv_kernel, scale=scale, seq_len=s, window=window,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, ng),
        in_specs=[big, nxt, big, big, big, nxt, row_big, row_nxt, row_big,
                  row_nxt, _seed_spec()],
        out_specs=[big, big],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, s_pad, dh), v.dtype),
        ],
        interpret=interpret,
    )(qp, qp, kp, vp, dop, dop, lsep, lsep, deltap, deltap, seed)
    return dq, dk[:, :s], dv[:, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _windowed_attention(q, k, v, seed, scale, window, interpret,
                        dropout_rate, block_rows):
    out, _ = _win_fwd(
        q, k, v, seed, scale, window, interpret, dropout_rate, block_rows
    )
    return out


def _windowed_attention_fwd(q, k, v, seed, scale, window, interpret,
                            dropout_rate, block_rows):
    out, lse = _win_fwd(
        q, k, v, seed, scale, window, interpret, dropout_rate, block_rows
    )
    return out, (q, k, v, seed, out, lse)


def _windowed_attention_bwd(scale, window, interpret, dropout_rate,
                            block_rows, res, do):
    q, k, v, seed, out, lse = res
    dq, dk, dv = _win_bwd(
        q, k, v, seed, out, lse, do, scale, window, interpret, dropout_rate,
        block_rows,
    )
    return dq, dk, dv, _seed_cotangent(seed)


_windowed_attention.defvjp(_windowed_attention_fwd, _windowed_attention_bwd)


def windowed_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    window_size: int,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_rows: Optional[int] = None,
) -> jnp.ndarray:
    """Banded flash attention over (B, H, S, Dh): each query window of
    ``window_size`` tokens attends to its own + the previous window — the
    Pallas counterpart of :func:`tchvp_tpu.ops.attention.sdpa_windowed`
    with O(S * window) compute and memory. ``dropout_rate``/``dropout_seed``
    as in :func:`mha` (same global-index mask). ``block_rows`` sets the
    target query rows per grid step (the kernel groups
    block_rows // window_size windows per step — see the banded-kernel
    section comment); default: the autotune cache for this
    (device, shape, window, dtype) when one exists, else
    DEFAULT_BAND_ROWS."""
    from tchvp_tpu.kernels import autotune

    b, h, s, dh = q.shape
    block_rows = autotune.band_rows("band", q.shape, window_size, q.dtype,
                                    block_rows)
    scale = 1.0 / math.sqrt(dh) if scale is None else scale
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed = _as_seed(dropout_seed, dropout_rate)
    qf = q.reshape(b * h, s, dh)
    kf = k.reshape(b * h, s, dh)
    vf = v.reshape(b * h, s, dh)
    out = _windowed_attention(
        qf, kf, vf, seed, scale, window_size, interpret, float(dropout_rate),
        block_rows,
    )
    return out.reshape(b, h, s, dh)


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------


def _seed_cotangent(seed):
    # Integer primal -> float0 cotangent (required by custom_vjp).
    import numpy as np

    return np.zeros(seed.shape, dtype=jax.dtypes.float0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def _flash_attention(q, k, v, seed, scale, block_q, block_k, interpret,
                     dropout_rate):
    out, _ = _flash_fwd(
        q, k, v, seed, scale, block_q, block_k, interpret, dropout_rate
    )
    return out


def _flash_attention_fwd(q, k, v, seed, scale, block_q, block_k, interpret,
                         dropout_rate):
    out, lse = _flash_fwd(
        q, k, v, seed, scale, block_q, block_k, interpret, dropout_rate
    )
    return out, (q, k, v, seed, out, lse)


def _flash_attention_bwd(scale, block_q, block_k, interpret, dropout_rate,
                         res, do):
    q, k, v, seed, out, lse = res
    dq, dk, dv = _flash_bwd(
        q, k, v, seed, out, lse, do, scale, block_q, block_k, interpret,
        dropout_rate,
    )
    return dq, dk, dv, _seed_cotangent(seed)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _as_seed(dropout_seed, dropout_rate: float) -> jnp.ndarray:
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires a dropout_seed")
    if dropout_seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(dropout_seed, jnp.int32).reshape(1)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
) -> jnp.ndarray:
    """Flash attention over (B, H, S, Dh); drop-in for
    :func:`tchvp_tpu.ops.attention.sdpa_xla` (no mask path).

    ``dropout_rate``/``dropout_seed``: attention-weight dropout inside the
    kernel (counter-based mask, O(1) memory; see module docstring). The
    mask for batch-head ``bh`` equals
    ``attention_dropout_mask(dropout_seed, bh, S, S, rate)``.

    ``block_q``/``block_k`` default to the autotune cache for this
    (device, shape, dtype) when one exists (``tchvp tune``), else
    DEFAULT_BLOCK_Q/K.
    """
    from tchvp_tpu.kernels import autotune

    b, h, s, dh = q.shape
    block_q, block_k = autotune.flash_blocks(q.shape, q.dtype, block_q,
                                             block_k)
    scale = 1.0 / math.sqrt(dh) if scale is None else scale
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed = _as_seed(dropout_seed, dropout_rate)
    qf = q.reshape(b * h, s, dh)
    kf = k.reshape(b * h, s, dh)
    vf = v.reshape(b * h, s, dh)
    out = _flash_attention(
        qf, kf, vf, seed, scale, block_q, block_k, interpret,
        float(dropout_rate),
    )
    return out.reshape(b, h, s, dh)


# ---------------------------------------------------------------------------
# Halo-context windowed kernels (sequence parallelism, survey §5.7)
#
# Per-shard variant of the banded kernels for seq-sharded tokens: k/v carry
# ONE extra leading window — the halo ppermute'd from the left neighbor
# (ops/attention.py::sdpa_windowed_seq_sharded) — so local query window i
# attends k_ext windows {i, i+1} with no modulo games. `has_prev` is a
# TRACED (1,) int32: 0 on the true sequence start (shard 0), where the halo
# window (ppermute zeros) must be masked exactly like the non-halo kernel
# masks window 0's missing predecessor. Gradients w.r.t. the halo window
# flow out through dk_ext[:, :w] and ride the ppermute transpose back to
# the owning shard — JAX AD handles that through the outer concat.
#
# Round-3: same GROUPED single-pass redesign as the banded kernels above.
# Because k_ext is already shifted one window left, the key span of query
# block gi (rows [gi*BQ, gi*BQ+BQ)) is the CONTIGUOUS k_ext slice
# [gi*BQ, gi*BQ + BQ + w) — one aligned big block plus one window block,
# no unaligned loads. Dropout keys use shard-local coordinates
# (k_ext column - window), identical to the old per-window grid's.
# ---------------------------------------------------------------------------


def _halo_band_mask(shape, row0, col0, window: int, seq_len: int, no_prev):
    """Validity for a (rows, cols) logit tile: rows are LOCAL query indices
    (row0 + r), cols are K_EXT indices (col0 + c, shifted +window vs local).
    Query window riw attends k_ext windows {riw, riw+1}; rows must lie in
    the true local sequence; k_ext window 0 (the halo) is masked when
    ``no_prev`` (true sequence start)."""
    row_g = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    col_g = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
    riw = row_g // window
    kiw = col_g // window
    return (
        ((kiw == riw) | (kiw == riw + 1))
        & (row_g >= 0)
        & (row_g < seq_len)
        & (col_g < seq_len + window)
        & jnp.logical_not((kiw == 0) & no_prev)
    )


def _halo_fwd_kernel(q_ref, kb_ref, kn_ref, vb_ref, vn_ref, has_prev_ref,
                     seed_ref, o_ref, lse_ref, *, scale: float, seq_len: int,
                     window: int, dropout_rate: float):
    b = pl.program_id(0)
    gi = pl.program_id(1)
    bq = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)  # (BQ, dh)
    k = jnp.concatenate([kb_ref[0], kn_ref[0]], axis=0).astype(jnp.float32)
    v = jnp.concatenate([vb_ref[0], vn_ref[0]], axis=0).astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BQ + w)

    row0 = gi * bq            # local query coords
    col0 = gi * bq            # k_ext coords (span starts at the block row)
    no_prev = has_prev_ref[0] == 0
    valid = _halo_band_mask(s.shape, row0, col0, window, seq_len, no_prev)
    s = jnp.where(valid, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(valid, p, 0.0)  # all-masked pad rows: kill exp(0)=1
    l = jnp.sum(p, axis=1, keepdims=True)
    if dropout_rate > 0.0:
        # Shard-local element indices (halo column block = -window); the
        # caller folds the PRNG per shard, so patterns are independent
        # across shards by construction.
        keep = _keep_mask(
            seed_ref[0], b, row0, col0 - window, s.shape, dropout_rate
        )
        p = p * keep.astype(jnp.float32) / (1.0 - dropout_rate)
    acc = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / safe_l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(safe_l)  # (BQ, 1)


def _halo_dq_kernel(q_ref, kb_ref, kn_ref, vb_ref, vn_ref, do_ref, lse_ref,
                    delta_ref, has_prev_ref, seed_ref, dq_ref, *,
                    scale: float, seq_len: int, window: int,
                    dropout_rate: float):
    b = pl.program_id(0)
    gi = pl.program_id(1)
    bq = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)
    k = jnp.concatenate([kb_ref[0], kn_ref[0]], axis=0).astype(jnp.float32)
    v = jnp.concatenate([vb_ref[0], vn_ref[0]], axis=0).astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (BQ, 1)
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    row0 = gi * bq
    col0 = gi * bq
    no_prev = has_prev_ref[0] == 0
    valid = _halo_band_mask(s.shape, row0, col0, window, seq_len, no_prev)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lse)
    p = jnp.where(valid, p, 0.0)  # pad rows carry garbage lse
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        keep = _keep_mask(
            seed_ref[0], b, row0, col0 - window, s.shape, dropout_rate
        )
        dp = dp * keep.astype(jnp.float32) / (1.0 - dropout_rate)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _halo_dkv_kernel(qp_ref, qo_ref, k_ref, v_ref, dop_ref, doo_ref,
                     lsep_ref, lseo_ref, deltap_ref, deltao_ref,
                     has_prev_ref, seed_ref, dk_ref, dv_ref, *, scale: float,
                     seq_len: int, window: int, dropout_rate: float):
    b = pl.program_id(0)
    gj = pl.program_id(1)
    bk = k_ref.shape[1]
    k = k_ref[0].astype(jnp.float32)  # (BK, dh) of k_ext
    v = v_ref[0].astype(jnp.float32)
    # Contributing queries for k_ext windows [gj*G, gj*G+G): local windows
    # [gj*G - 1, gj*G + G) — one window LEFT of the block plus the
    # block-aligned span (clamped loads; out-of-range rows masked).
    qs = jnp.concatenate([qp_ref[0], qo_ref[0]], axis=0).astype(jnp.float32)
    dos = jnp.concatenate([dop_ref[0], doo_ref[0]], axis=0).astype(jnp.float32)
    lses = jnp.concatenate([lsep_ref[0], lseo_ref[0]], axis=0)  # (w+BK, 1)
    deltas = jnp.concatenate([deltap_ref[0], deltao_ref[0]], axis=0)

    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (w + BK, BK)
    row0 = gj * bk - window   # local query coords
    col0 = gj * bk            # k_ext coords
    no_prev = has_prev_ref[0] == 0
    valid = _halo_band_mask(s.shape, row0, col0, window, seq_len, no_prev)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lses)
    p = jnp.where(valid, p, 0.0)  # pad/clamped rows carry garbage lse

    if dropout_rate > 0.0:
        keep = (
            _keep_mask(
                seed_ref[0], b, row0, col0 - window, s.shape, dropout_rate
            ).astype(jnp.float32) / (1.0 - dropout_rate)
        )
        p_drop = p * keep
    else:
        p_drop = p

    dv_ref[0] = jax.lax.dot_general(
        p_drop, dos, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        dos, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        dp = dp * keep
    ds = p * (dp - deltas) * scale
    dk_ref[0] = jax.lax.dot_general(
        ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _win_halo_fwd(q, k_ext, v_ext, has_prev, seed, scale: float, window: int,
                  interpret: bool, dropout_rate: float,
                  block_rows: Optional[int] = None):
    """q: (BH, S, Dh), k_ext/v_ext: (BH, S+window, Dh); S % window == 0."""
    bh, s, dh = q.shape
    if s % window:
        raise ValueError(f"halo kernel needs S % window == 0; {s} % {window}")
    g, bq, s_pad, ng = _band_geometry(s, window, block_rows)
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0)))
        kv_pad = ((0, 0), (0, s_pad - s), (0, 0))
        k_ext, v_ext = jnp.pad(k_ext, kv_pad), jnp.pad(v_ext, kv_pad)

    big = pl.BlockSpec((1, bq, dh), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    # The extra window past the block-aligned span: k_ext window gi*G + G;
    # padded k_ext has s_pad//w + 1 windows, so the index never clamps.
    nxt = pl.BlockSpec((1, window, dh), lambda b, i: (b, i * g + g, 0),
                       memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(
            _halo_fwd_kernel, scale=scale, seq_len=s, window=window,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, ng),
        in_specs=[big, big, nxt, big, nxt, _seed_spec(), _seed_spec()],
        out_specs=[
            big,
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, s_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k_ext, k_ext, v_ext, v_ext, has_prev, seed)
    return out[:, :s], lse[:, :s, 0]


def _win_halo_bwd(q, k_ext, v_ext, has_prev, seed, out, lse, do,
                  scale: float, window: int, interpret: bool,
                  dropout_rate: float, block_rows: Optional[int] = None):
    bh, s, dh = q.shape
    g, bq, s_pad, ng = _band_geometry(s, window, block_rows)
    nw_pad = s_pad // window
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    def padq(x):
        return jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))

    qp, dop = padq(q), padq(do)
    lsep, deltap = padq(lse[..., None]), padq(delta[..., None])
    # k_ext for dq needs s_pad + w rows; for dkv the output grid tiles in
    # BQ blocks, so pad to s_pad + BQ (the tail past s+w is masked).
    kq = jnp.pad(k_ext, ((0, 0), (0, s_pad + bq - k_ext.shape[1]), (0, 0)))
    vq = jnp.pad(v_ext, ((0, 0), (0, s_pad + bq - v_ext.shape[1]), (0, 0)))

    big = pl.BlockSpec((1, bq, dh), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, window, dh), lambda b, i: (b, i * g + g, 0),
                       memory_space=pltpu.VMEM)
    row_big = pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(
            _halo_dq_kernel, scale=scale, seq_len=s, window=window,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, ng),
        in_specs=[big, big, nxt, big, nxt, big, row_big, row_big,
                  _seed_spec(), _seed_spec()],
        out_specs=[big],
        out_shape=[jax.ShapeDtypeStruct((bh, s_pad, dh), q.dtype)],
        interpret=interpret,
    )(qp, kq, kq, vq, vq, dop, lsep, deltap, has_prev, seed)[0][:, :s]

    # dk/dv: grid over ng+1 k_ext BQ-blocks (the +1 covers the final real
    # k_ext window when s == s_pad). Contributing q span = one window left
    # + the block-aligned span; both loads clamp and the mask recovers.
    prvq = pl.BlockSpec(
        (1, window, dh),
        lambda b, j: (b, jnp.clip(j * g - 1, 0, nw_pad - 1), 0),
        memory_space=pltpu.VMEM,
    )
    ownq = pl.BlockSpec(
        (1, bq, dh), lambda b, j: (b, jnp.minimum(j, pl.num_programs(1) - 2), 0),
        memory_space=pltpu.VMEM,
    )
    row_prv = pl.BlockSpec(
        (1, window, 1),
        lambda b, j: (b, jnp.clip(j * g - 1, 0, nw_pad - 1), 0),
        memory_space=pltpu.VMEM,
    )
    row_own = pl.BlockSpec(
        (1, bq, 1), lambda b, j: (b, jnp.minimum(j, pl.num_programs(1) - 2), 0),
        memory_space=pltpu.VMEM,
    )
    kbig = pl.BlockSpec((1, bq, dh), lambda b, j: (b, j, 0),
                        memory_space=pltpu.VMEM)
    dk_ext, dv_ext = pl.pallas_call(
        functools.partial(
            _halo_dkv_kernel, scale=scale, seq_len=s, window=window,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, ng + 1),
        in_specs=[prvq, ownq, kbig, kbig, prvq, ownq,
                  row_prv, row_own, row_prv, row_own, _seed_spec(),
                  _seed_spec()],
        out_specs=[kbig, kbig],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad + bq, dh), k_ext.dtype),
            jax.ShapeDtypeStruct((bh, s_pad + bq, dh), v_ext.dtype),
        ],
        interpret=interpret,
    )(qp, qp, kq, vq, dop, dop, lsep, lsep, deltap, deltap, has_prev, seed)
    return dq, dk_ext[:, : s + window], dv_ext[:, : s + window]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _windowed_attention_halo(q, k_ext, v_ext, has_prev, seed, scale, window,
                             interpret, dropout_rate, block_rows):
    out, _ = _win_halo_fwd(
        q, k_ext, v_ext, has_prev, seed, scale, window, interpret,
        dropout_rate, block_rows,
    )
    return out


def _windowed_attention_halo_fwd(q, k_ext, v_ext, has_prev, seed, scale,
                                 window, interpret, dropout_rate, block_rows):
    out, lse = _win_halo_fwd(
        q, k_ext, v_ext, has_prev, seed, scale, window, interpret,
        dropout_rate, block_rows,
    )
    return out, (q, k_ext, v_ext, has_prev, seed, out, lse)


def _windowed_attention_halo_bwd(scale, window, interpret, dropout_rate,
                                 block_rows, res, do):
    q, k_ext, v_ext, has_prev, seed, out, lse = res
    dq, dk_ext, dv_ext = _win_halo_bwd(
        q, k_ext, v_ext, has_prev, seed, out, lse, do, scale, window,
        interpret, dropout_rate, block_rows,
    )
    return dq, dk_ext, dv_ext, _seed_cotangent(has_prev), _seed_cotangent(seed)


_windowed_attention_halo.defvjp(
    _windowed_attention_halo_fwd, _windowed_attention_halo_bwd
)


def windowed_mha_halo(
    q: jnp.ndarray,
    k_ext: jnp.ndarray,
    v_ext: jnp.ndarray,
    *,
    window_size: int,
    has_prev,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_rows: Optional[int] = None,
) -> jnp.ndarray:
    """Banded flash attention with an explicit left-context window.

    q: (B, H, S, Dh); k_ext/v_ext: (B, H, S + window_size, Dh) whose first
    window is the context (e.g. the seq-parallel ppermute halo).
    ``has_prev``: traced bool/int — 0 masks the context window (true
    sequence start). Matches :func:`windowed_mha` exactly when the context
    window is present (equivalently, equals full banded attention over the
    concatenated sequence with the first window's outputs dropped).
    ``block_rows`` as in :func:`windowed_mha` (autotune kernel "halo").
    """
    from tchvp_tpu.kernels import autotune

    b, h, s, dh = q.shape
    block_rows = autotune.band_rows("halo", q.shape, window_size, q.dtype,
                                    block_rows)
    scale = 1.0 / math.sqrt(dh) if scale is None else scale
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed = _as_seed(dropout_seed, dropout_rate)
    hp = jnp.asarray(has_prev, jnp.int32).reshape(1)
    out = _windowed_attention_halo(
        q.reshape(b * h, s, dh),
        k_ext.reshape(b * h, s + window_size, dh),
        v_ext.reshape(b * h, s + window_size, dh),
        hp, seed, scale, window_size, interpret, float(dropout_rate),
        block_rows,
    )
    return out.reshape(b, h, s, dh)
