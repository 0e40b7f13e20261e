"""Token multi-head attention: one op interface, multiple implementations.

The reference has two attention cores, both full-quadratic:
* ``nn.MultiheadAttention`` inside every FCT block (reference ``FCT.py:37,75``)
  over H*W spatial tokens;
* a hand-rolled matmul attention in the recovered ``TransformerEncoder.py``
  (L49-61) over temporal frame tokens.

Here both route through :func:`multi_head_attention`, which dispatches to:
* ``"xla"``  — einsum attention, fp32 accumulation, fused by XLA;
* ``"flash"`` — Pallas blockwise-softmax flash attention (O(S) memory);
* ``"windowed"`` — overlapping-window attention for long/streaming clips
  (survey §5.7 build-new component ⊕B).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, S, D) -> (B, H, S, D//H)."""
    b, s, d = x.shape
    x = x.reshape(b, s, num_heads, d // num_heads)
    return jnp.transpose(x, (0, 2, 1, 3))


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, S, Dh) -> (B, S, H*Dh)."""
    b, h, s, dh = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, s, h * dh)


def sdpa_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, S, Dh) with fp32 softmax.

    ``mask``: optional boolean, broadcastable to (B, H, Sq, Sk); True = keep.
    The reference's additive -1e9 masking (TransformerEncoder.py L54-55) is
    reproduced via a large negative fill.
    """
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh) if scale is None else scale
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.asarray(scale, dtype=logits.dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e9, logits.dtype))
    weights = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def sdpa_windowed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    window_size: int,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Overlapping-window attention over (B, H, S, Dh).

    Each query window of ``window_size`` tokens attends to its own window
    plus the previous one (one-window left overlap) — the streaming-friendly
    temporal pattern for long clips (BASELINE configs 2 and 4). Memory is
    O(S * window) instead of O(S^2). Sequence length must be a multiple of
    ``window_size`` (pad upstream). Attention-weight dropout matches
    :func:`sdpa_xla` semantics on the banded weights.
    """
    b, h, s, dh = q.shape
    w = window_size
    assert s % w == 0, f"seq len {s} not a multiple of window {w}"
    nw = s // w
    scale = 1.0 / math.sqrt(dh) if scale is None else scale

    qw = q.reshape(b, h, nw, w, dh)
    kw = k.reshape(b, h, nw, w, dh)
    vw = v.reshape(b, h, nw, w, dh)
    # Previous window's keys/values (window 0 sees zeros, masked out below).
    k_prev = jnp.concatenate([jnp.zeros_like(kw[:, :, :1]), kw[:, :, :-1]], axis=2)
    v_prev = jnp.concatenate([jnp.zeros_like(vw[:, :, :1]), vw[:, :, :-1]], axis=2)
    k_ctx = jnp.concatenate([k_prev, kw], axis=3)  # (b,h,nw,2w,dh)
    v_ctx = jnp.concatenate([v_prev, vw], axis=3)

    logits = jnp.einsum(
        "bhnqd,bhnkd->bhnqk", qw, k_ctx, preferred_element_type=jnp.float32
    ) * jnp.asarray(scale, jnp.float32)
    # Mask the (zero) previous-window context of the first window.
    first = jnp.arange(nw).reshape(1, 1, nw, 1, 1) == 0
    is_prev = jnp.arange(2 * w).reshape(1, 1, 1, 1, 2 * w) < w
    logits = jnp.where(first & is_prev, jnp.asarray(-1e9, logits.dtype), logits)
    weights = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    weights = weights.astype(v.dtype)
    out = jnp.einsum("bhnqk,bhnkd->bhnqd", weights, v_ctx)
    return out.reshape(b, h, s, dh)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    impl: str = "xla",
    window_size: int = 0,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Multi-head attention over already-projected (B, S, D) tokens.

    ``impl="auto"`` resolves to the Pallas flash kernel on TPU (measured
    faster and far cheaper to compile for the big spatial token counts)
    and to the XLA einsum path elsewhere.
    """
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" and mask is None else "xla"
    drop_active = dropout_rate > 0.0 and not deterministic
    if drop_active and dropout_rng is None:
        raise ValueError("active attention dropout requires dropout_rng")
    if impl == "flash" and mask is None:
        from tchvp_tpu.kernels import flash_attention

        # The Pallas kernels apply attention-weight dropout in-kernel via a
        # counter-based mask; derive its integer seed from the flax RNG key.
        seed = (
            jax.random.randint(dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32)
            if drop_active
            else None
        )
        rate = dropout_rate if drop_active else 0.0
        if window_size > 0:
            out = flash_attention.windowed_mha(
                qh, kh, vh, window_size=window_size, scale=scale,
                dropout_rate=rate, dropout_seed=seed,
            )
        else:
            out = flash_attention.mha(
                qh, kh, vh, scale=scale, dropout_rate=rate, dropout_seed=seed
            )
    elif impl == "windowed" and window_size > 0 and mask is None:
        out = sdpa_windowed(
            qh, kh, vh, window_size=window_size, scale=scale,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
    else:
        out = sdpa_xla(
            qh,
            kh,
            vh,
            scale=scale,
            mask=mask,
            dropout_rate=dropout_rate,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
    return _merge_heads(out)


class TorchMultiheadAttention(nn.Module):
    """Self-attention numerically matching ``torch.nn.MultiheadAttention``.

    Fused qkv in-projection + out-projection with bias, scaled by
    1/sqrt(head_dim) — the core used by every FCT block (``FCT.py:37``).
    ``impl`` selects the attention math ("xla" | "flash" | "windowed").
    """

    features: int
    num_heads: int
    use_bias: bool = True
    impl: str = "xla"
    window_size: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        d = self.features
        dense = lambda name: nn.Dense(  # noqa: E731
            d,
            use_bias=self.use_bias,
            name=name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        out = multi_head_attention(
            q,
            k,
            v,
            self.num_heads,
            impl=self.impl,
            window_size=self.window_size,
            mask=mask,
        )
        return nn.Dense(
            d,
            use_bias=self.use_bias,
            name="out_proj",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(out)
