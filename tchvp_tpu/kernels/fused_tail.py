"""Fused decoder tail: ConvTranspose(2,2)+BN+ReLU -> three 3x3 conv+BN
stages in ONE Pallas kernel.

Why: the flagship step is HBM-bound (BENCHES.md roofline: 62% bandwidth,
49% MXU). The decoder tail is the traffic monster — XLA writes + re-reads
the 192ch full-resolution tensor (4.9 GB/step) and the 64ch one
(1.6 GB/step). This kernel reads the 384ch half-resolution input once and
writes only the 3ch (or 1ch) output: ~6.5 GB/step saved (~22% of total
traffic).

Design notes:
* ConvTranspose(k2,s2) has non-overlapping taps == 1x1 conv to 4*C1 +
  pixel shuffle. The shuffle's row interleave is avoided by storing every
  intermediate as row-parity planes ``(2, rows/2, width, C)`` — all 3x3
  row taps then become *static* contiguous slices of the two planes, and
  the output rides as ``(B, H, 2, 2W, C)`` which the caller reshapes back
  (a pure view: row = 2a + p).
* Each 3x3 conv = 9 shifted (M, Cin) @ (Cin, Cout) MXU matmuls
  accumulated in fp32, intermediates stored in the input dtype (bf16).
* Inference-mode BatchNorm is folded into weights/bias by
  :func:`fold_tail_params`; SAME-padding border semantics are preserved
  by zero-masking the upsample output outside the real image.
* Grid (B, gh, gw) over output tiles; the (pre-padded) input stays in
  HBM (memory_space=ANY) and each grid step DMAs its
  (tile/2 + 4)^2 x 384 slice.

All row/col indices inside the kernel are "ub-relative": row r / col c
of the upsampled tile buffer, whose origin sits at out-res coordinate
(ti*tile - 4, tj*tile - 4). Valid regions per stage:
  ub rows/cols [0, tile+8)  ->  c0 [1, tile+7)  ->  c1 [2, tile+6)
  -> head output [3, tile+5), of which the tile itself is [4, tile+4).

Inference-only (no VJP): training keeps the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO_IN = 2  # input-res halo: three stacked 3x3 convs need 3 at out-res


# ---------------------------------------------------------------------------
# BN folding + weight packing
# ---------------------------------------------------------------------------


def _bn_scale_shift(bn_params, bn_stats, eps=1e-5):
    gamma = bn_params["scale"]
    beta = bn_params["bias"]
    mean = bn_stats["mean"]
    var = bn_stats["var"]
    s = gamma / jnp.sqrt(var + eps)
    return s, beta - mean * s


def fold_tail_params(params, batch_stats) -> dict:
    """Fold eval-mode BN into the Decoder32K tail's conv weights.

    ``params`` / ``batch_stats``: the decoder's variable subtrees.
    Returns the array dict consumed by :func:`fused_decoder_tail`.
    """

    def bn(name):
        return _bn_scale_shift(
            params[name]["BatchNorm_0"], batch_stats[name]["BatchNorm_0"]
        )

    s_up, t_up = bn("up_bn1")
    k_ct = params["upconv1"]["kernel"]  # (2, 2, Cin, C1), flax orientation
    b_ct = params["upconv1"]["bias"]
    # flax ConvTranspose(k2,s2): out[2i+di, 2j+dj] = sum_ci x[i,j,ci] *
    # k[::-1, ::-1][di, dj, ci, :]  (orientation verified against flax).
    k_ps = k_ct[::-1, ::-1] * s_up  # BN scale folds into output channels
    b_up = b_ct * s_up + t_up
    cin, c1 = k_ps.shape[2], k_ps.shape[3]
    # Pack as (Cin, 4*C1), column order (di, dj, c); bias tiled to match.
    w_up = jnp.transpose(k_ps, (2, 0, 1, 3)).reshape(cin, 4 * c1)
    b_up4 = jnp.tile(b_up, 4)

    s0, t0 = bn("post_bn0")
    s1, t1 = bn("post_bn1")
    s2, t2 = bn("head_bn")
    return dict(
        w_up=w_up,
        b_up=b_up,
        b_up4=b_up4,
        w0=params["post_conv0"]["kernel"] * s0,
        b0=t0,
        w1=params["post_conv1"]["kernel"] * s1,
        b1=t1,
        w2=params["head_conv"]["kernel"] * s2,
        b2=params["head_conv"]["bias"] * s2 + t2,
    )


# ---------------------------------------------------------------------------
# Reference implementation (jnp) — ground truth for tests + CPU fallback.
# ---------------------------------------------------------------------------


def fused_tail_reference(x, folded, output_type: str = "image"):
    """Pixel-shuffle + conv chain with folded BN, plain XLA ops."""
    b, h, w, _ = x.shape
    c1 = folded["b_up"].shape[0]
    y = x.astype(jnp.float32) @ folded["w_up"].astype(jnp.float32)
    y = y.reshape(b, h, w, 2, 2, c1)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, c1)
    y = jax.nn.relu(y + folded["b_up"])

    def conv(v, k, bias):
        out = jax.lax.conv_general_dilated(
            v, k.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias

    y = jax.nn.relu(conv(y, folded["w0"], folded["b0"]))
    y = jax.nn.relu(conv(y, folded["w1"], folded["b1"]))
    y = conv(y, folded["w2"], folded["b2"])
    act = jax.nn.sigmoid if output_type == "mask" else jax.nn.relu
    return act(y).astype(x.dtype)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

# Polyphase design: every intermediate lives as 4 phase planes
# ``[row_parity p][col_parity u]`` holding out-res pixels (2a+p, 2m+u) at
# storage index (a+1, m+1) (one pad row/col for the -1 tap offsets). The
# pixel shuffle is then just "write each (di, dj) projection to its
# plane", every 3x3 tap is a static plane slice, and the kernel never
# reshapes across the sublane dim (Mosaic-safe: rank-3 dot_general +
# last-dim-preserving slices only). The output rides as
# (B, H, 2, W, 2, C); reshaping to (B, 2H, 2W, C) outside is a pure view.


def _kernel(x_ref, wup_ref, bup_ref, w0_ref, b0_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, out_ref, xs, ub, c0, c1b, dma_sem, *,
            tile: int, h_in: int, w_in: int, c_in: int, c1: int, c2: int,
            c3: int, c4: int, sigmoid_head: bool):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    th2 = tile // 2
    ein = th2 + 2 * HALO_IN   # half-res rows/cols incl. halo
    ein8 = -(-ein // 8) * 8   # padded: Mosaic collapses rank-3 dot
                              # operands, needing 8-aligned second-minor
    f32 = jnp.float32

    # ---- DMA the input tile (+halo); x was pre-padded by HALO_IN and
    # right-padded so an 8-aligned ein8-wide slice is always in bounds
    # (Mosaic requires DMA slice widths aligned to the sublane tiling).
    # Zero the non-DMA'd pad rows: they flow only into phase cells no
    # valid output ever reads, but must stay finite.
    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(ti * th2, ein), pl.ds(tj * th2, ein8), :],
        xs,
        dma_sem,
    )
    dma.start()
    dma.wait()

    # Phase-plane coords: plane (p, u) index (a, m) = out-res pixel
    # (2a + p + row_g0, 2m + u + col_g0), stored at (a + 1, m + 1).
    row_g0 = ti * tile - 4
    col_g0 = tj * tile - 4

    def phase_mask(p, u, nr, nc, r_off=0):
        rows_g = (
            jax.lax.broadcasted_iota(jnp.int32, (nr, 1, 1), 0) + r_off
        ) * 2 + p + row_g0
        cols_g = (
            jax.lax.broadcasted_iota(jnp.int32, (1, nc, 1), 1) * 2 + u + col_g0
        )
        return (
            (rows_g >= 0) & (rows_g < 2 * h_in)
            & (cols_g >= 0) & (cols_g < 2 * w_in)
        )

    # ---- Stage 1: per-phase 1x1 up-projection (the pixel shuffle). ----
    # Matmul operands stay in the input dtype (bf16 feeds the MXU
    # natively); accumulation is fp32 via preferred_element_type. Row
    # chunks bound the fp32 transient (VMEM budget).
    bup = bup_ref[:].astype(f32)  # (4, 1, c1)
    RC = ein // 2
    for p in range(2):
        for u in range(2):
            k = p * 2 + u  # (di, dj) = (p, u)
            for r0 in range(0, ein, RC):
                y = jax.lax.dot_general(
                    xs[pl.ds(r0, RC)], wup_ref[k],
                    (((2,), (0,)), ((), ())), preferred_element_type=f32,
                )  # (RC, ein8, c1) fp32
                y = jnp.maximum(y + bup[k], 0.0)
                y = jnp.where(phase_mask(p, u, RC, ein8, r0), y, 0.0)
                ub[p, u, pl.ds(1 + r0, RC), pl.ds(1, ein8), :] = y.astype(
                    ub.dtype
                )

    # ---- 3x3 conv stages on phase planes (all slices static). ---------
    def conv_phase(src, w, bias, cout, p, u, lo, hi):
        """Out-phase rows/cols a, m with 2a+p and 2m+u in ub-rel
        [2*lo - ..]; concretely: valid out phase indices a (and m) run
        [lo_pu, hi_pu) where lo_pu = ceil((lo - p)/2) for rows (same with
        u for cols). Returns (a0, m0, out3) in phase coords."""
        a0 = -((lo - p) // -2)
        a1 = (hi - 1 - p) // 2 + 1
        m0 = -((lo - u) // -2)
        n = a1 - a0
        # Fixed 8-aligned slice width: columns beyond the valid range
        # compute garbage that only ever feeds garbage (see module doc).
        acc = jnp.zeros((n, ein8, cout), f32)
        for dy in range(3):
            q = (p - 1 + dy) % 2
            offr = (p - 1 + dy - q) // 2
            for dx in range(3):
                v = (u - 1 + dx) % 2
                offc = (u - 1 + dx - v) // 2
                sl = src[q, v, pl.ds(a0 + offr + 1, n),
                         pl.ds(m0 + offc + 1, ein8), :]
                acc += jax.lax.dot_general(
                    sl, w[dy * 3 + dx],
                    (((2,), (0,)), ((), ())), preferred_element_type=f32,
                )
        return a0, m0, acc + bias

    def run_stage(src, dst, w_ref, b_ref, cout, lo, hi):
        w = w_ref[:]  # (9, cin, cout)
        bias = b_ref[:].astype(f32)[0]  # (cout,)
        for p in range(2):
            for u in range(2):
                a0, m0, acc = conv_phase(src, w, bias, cout, p, u, lo, hi)
                n, mm = acc.shape[0], acc.shape[1]
                out = jnp.maximum(acc, 0.0)
                # Border zeroing for the NEXT stage's SAME-padding taps.
                rows_g = (
                    jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0) + a0
                ) * 2 + p + row_g0
                cols_g = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, mm, 1), 1) + m0
                ) * 2 + u + col_g0
                ok = (
                    (rows_g >= 0) & (rows_g < 2 * h_in)
                    & (cols_g >= 0) & (cols_g < 2 * w_in)
                )
                out = jnp.where(ok, out, 0.0)
                dst[p, u, pl.ds(a0 + 1, n), pl.ds(m0 + 1, mm), :] = (
                    out.astype(dst.dtype)
                )

    # c0 valid ub-rel [1, wid-1); c1 [2, wid-2); head [3, wid-3).
    wid = tile + 8
    run_stage(ub, c0, w0_ref, b0_ref, c2, 1, wid - 1)
    run_stage(c0, c1b, w1_ref, b1_ref, c3, 2, wid - 2)

    # ---- Head conv + activation; write the tile interior. -------------
    w2 = w2_ref[:]
    b2 = b2_ref[:].astype(f32)[0]
    for p in range(2):
        for u in range(2):
            a0, m0, acc = conv_phase(c1b, w2, b2, c4, p, u, 3, wid - 3)
            act = jax.nn.sigmoid(acc) if sigmoid_head else jnp.maximum(acc, 0.0)
            # Tile interior: ub-rel [4, 4+tile) -> phase indices [2, 2+tile/2).
            r0 = 2 - a0
            s0 = 2 - m0
            out_ref[p, u, 0] = act[
                r0 : r0 + tile // 2, s0 : s0 + tile // 2, :
            ].astype(out_ref.dtype)


def fused_decoder_tail(
    x: jnp.ndarray,
    folded: dict,
    output_type: str = "image",
    tile: int = 112,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x: (B, H, W, 384) -> (B, 2H, 2W, 3|1): Decoder32K.tail semantics
    with eval-mode BN folded in. Falls back to the XLA reference when the
    shape doesn't tile (2H % tile != 0)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, cin = x.shape
    th2 = tile // 2
    ein = th2 + 2 * HALO_IN
    ein8 = -(-ein // 8) * 8
    if (2 * h) % tile or (2 * w) % tile or (tile // 2) % 8:
        return fused_tail_reference(x, folded, output_type)
    gh, gw = (2 * h) // tile, (2 * w) // tile
    c1 = folded["b_up"].shape[0]
    c2 = folded["b0"].shape[0]
    c3 = folded["b1"].shape[0]
    c4 = folded["b2"].shape[0]

    xp = jnp.pad(
        x,
        ((0, 0), (HALO_IN, HALO_IN),
         (HALO_IN, HALO_IN + (ein8 - ein)), (0, 0)),
    )

    # Weight packing for static in-kernel indexing:
    # up: (4, Cin, C1) per (di, dj); convs: (9, Cin, Cout) per (dy, dx).
    wup4 = jnp.transpose(
        folded["w_up"].reshape(cin, 2, 2, c1), (1, 2, 0, 3)
    ).reshape(4, cin, c1)
    bup4 = jnp.broadcast_to(folded["b_up"], (4, c1)).reshape(4, 1, c1)

    def conv9(wk):
        kh, kw, ci, co = wk.shape
        return wk.reshape(kh * kw, ci, co)

    def row(v):
        return v.reshape(1, -1).astype(x.dtype)

    pe = ein8 + 4  # phase cols: pad col + 8-aligned slice overhang
    out6 = pl.pallas_call(
        functools.partial(
            _kernel, tile=tile, h_in=h, w_in=w, c_in=cin, c1=c1, c2=c2,
            c3=c3, c4=c4, sigmoid_head=(output_type == "mask"),
        ),
        grid=(b, gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # padded input (DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wup4 (4, Cin, C1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bup4 (4, 1, C1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0 (9, C1, C2)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0 (1, C2)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        # Phase dims lead so the in-kernel store needs no interior unit
        # dims (Mosaic rejects (n,m,c)->(1,n,1,m,1,c) reshapes). Block
        # W dim = tile//2 must be 8-aligned -> tile % 16 == 0.
        out_specs=pl.BlockSpec(
            (2, 2, 1, tile // 2, tile // 2, c4),
            lambda bb, i, j: (0, 0, bb, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, 2, b, h, w, c4), x.dtype),
        scratch_shapes=[
            # Rows are a free dim; only the (sublane) col dim needs the
            # 8-aligned ein8 sizing.
            pltpu.VMEM((ein, ein8, cin), x.dtype),        # xs
            pltpu.VMEM((2, 2, ein + 2, pe, c1), x.dtype),  # ub phases
            pltpu.VMEM((2, 2, ein + 2, pe, c2), x.dtype),  # c0 phases
            pltpu.VMEM((2, 2, ein + 2, pe, c3), x.dtype),  # c1 phases
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        xp,
        wup4.astype(x.dtype), bup4.astype(x.dtype),
        conv9(folded["w0"]).astype(x.dtype), row(folded["b0"]),
        conv9(folded["w1"]).astype(x.dtype), row(folded["b1"]),
        conv9(folded["w2"]).astype(x.dtype), row(folded["b2"]),
    )
    # (p, u, B, H, W, C) phase planes -> (B, 2H, 2W, C): transpose in XLA
    # (cheap: the output is the small 3ch tensor), then a pure view.
    out6 = jnp.transpose(out6, (2, 3, 0, 4, 1, 5))
    return out6.reshape(b, 2 * h, 2 * w, c4)
