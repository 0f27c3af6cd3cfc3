"""Core transformer layers: Glow-TTS-style relative-window attention encoder.

Capability parity with the reference rel-transformer
(/root/reference/modules/commons/rel_transformer_encoder.py) with TPU-first
re-design decisions:

- Feature-last [B, T, C] layout throughout (flax nn.Conv is NWC-native;
  the reference works in torch's [B, C, T]).
- Relative-position scores are computed as a [T, 2w+1] band and expanded to
  absolute positions with a single clamped `take_along_axis` gather
  (`band_to_full`/`full_to_band`), instead of the reference's pad/reshape
  skew trick (:_relative_position_to_absolute_position) — same math, XLA
  fuses the gather, and it is valid for all T (the trick needs T >= w+1
  special-casing in `_get_relative_embeddings`).
- Weight norm is not used; parity with the reference's inference graph,
  which folds it away (`remove_weight_norm`, tasks/tts/ps_flow.py:262-268).
- LayerNorm normalizes the feature axis with eps=1e-4 (reference LayerNorm
  normalizes torch dim 1 == channels, eps 1e-4).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.ops.amp import cdtype

MASK_VALUE = -1e4  # reference masks attention scores with -1e4


def band_to_full(band: jnp.ndarray, length: int) -> jnp.ndarray:
    """[..., T, 2w+1] relative band -> [..., T, T] absolute (0 outside band).

    full[..., i, j] = band[..., i, j - i + w] for |j - i| <= w.
    """
    w = (band.shape[-1] - 1) // 2
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    m = j - i + w  # [T, T]
    valid = (m >= 0) & (m <= 2 * w)
    m = jnp.clip(m, 0, 2 * w)
    idx = m.reshape((1,) * (band.ndim - 2) + (length, length))
    full = jnp.take_along_axis(band, jnp.broadcast_to(idx, band.shape[:-2] + (length, length)), axis=-1)
    return jnp.where(valid, full, 0.0)


def full_to_band(full: jnp.ndarray, window: int) -> jnp.ndarray:
    """[..., T, T] absolute -> [..., T, 2w+1] band (0 outside sequence).

    band[..., i, m] = full[..., i, i + m - w] for 0 <= i + m - w < T.
    """
    length = full.shape[-1]
    i = jnp.arange(length)[:, None]
    m = jnp.arange(2 * window + 1)[None, :]
    j = i + m - window  # [T, 2w+1]
    valid = (j >= 0) & (j < length)
    j = jnp.clip(j, 0, length - 1)
    idx = j.reshape((1,) * (full.ndim - 2) + (length, 2 * window + 1))
    band = jnp.take_along_axis(full, jnp.broadcast_to(idx, full.shape[:-2] + (length, 2 * window + 1)), axis=-1)
    return jnp.where(valid, band, 0.0)


class LayerNorm(nn.Module):
    """Feature-axis layer norm, eps matching the reference (1e-4)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        # statistics in f32 (bf16 mean/var loses ~3 decimal digits); the
        # result is cast back to the incoming activation dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return (xf * gamma + beta).astype(x.dtype)


class ConvReluNorm(nn.Module):
    """Residual conv prenet (reference rel_transformer_encoder.py ConvReluNorm):
    n_layers of [conv-k, LayerNorm, relu, dropout], zero-init projection,
    residual add, masked."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # x: [B, T, C]; x_mask: [B, T, 1]
        x_mask = x_mask.astype(x.dtype)
        x_org = x
        for _ in range(self.n_layers):
            x = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME", dtype=cdtype())(x * x_mask)
            x = LayerNorm()(x)
            x = nn.relu(x)
            x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        proj = nn.Conv(
            self.out_channels, (1,), kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=cdtype(),
        )
        return (x_org + proj(x)) * x_mask


class ConvFFN(nn.Module):
    """conv-k -> relu (or gelu-sigmoid) -> conv-1, masked between convs
    (reference FFN, rel_transformer_encoder.py)."""

    filter_channels: int
    out_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x_mask = x_mask.astype(x.dtype)
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", dtype=cdtype())(x * x_mask)
        if self.activation == "gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = nn.relu(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = nn.Conv(self.out_channels, (1,), dtype=cdtype())(x * x_mask)
        return x * x_mask


class RelMultiHeadAttention(nn.Module):
    """Self-attention with shared-head windowed relative position embeddings.

    Math parity with the reference MultiHeadAttention (window_size=w,
    heads_share=True): scores = qk/sqrt(d) + (q @ rel_k[j-i+w])/sqrt(d);
    output += band(p_attn) @ rel_v.
    """

    channels: int
    n_heads: int
    window_size: Optional[int] = None
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        # x: [B, T, C]; attn_mask: [B, 1, T, T] or [B, T, T] (1 = attend)
        B, T, C = x.shape
        H = self.n_heads
        d = C // H
        q = nn.Dense(C, name="q", dtype=cdtype())(x).reshape(B, T, H, d).transpose(0, 2, 1, 3)
        k = nn.Dense(C, name="k", dtype=cdtype())(x).reshape(B, T, H, d).transpose(0, 2, 1, 3)
        v = nn.Dense(C, name="v", dtype=cdtype())(x).reshape(B, T, H, d).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) / math.sqrt(d)
        if self.window_size is not None:
            n_rel = 2 * self.window_size + 1
            rel_k = self.param(
                "rel_k", nn.initializers.normal(d**-0.5), (1, n_rel, d)
            )
            rel_band = jnp.einsum("bhid,xmd->bhim", q, rel_k.astype(q.dtype)).astype(jnp.float32) / math.sqrt(d)
            scores = scores + band_to_full(rel_band, T)
        if attn_mask is not None:
            if attn_mask.ndim == 3:
                attn_mask = attn_mask[:, None]
            scores = jnp.where(attn_mask == 0, MASK_VALUE, scores)
        # softmax statistics stay f32 under bf16 activations
        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", p_attn.astype(v.dtype), v)
        if self.window_size is not None:
            rel_v = self.param(
                "rel_v", nn.initializers.normal(d**-0.5), (1, 2 * self.window_size + 1, d)
            )
            band_w = full_to_band(p_attn, self.window_size)
            out = out + jnp.einsum("bhim,xmd->bhid", band_w.astype(v.dtype), rel_v.astype(v.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C, name="out", dtype=cdtype())(out)


class RelTransformerLayers(nn.Module):
    """Stack of [rel-attn + conv-FFN] blocks with pre/post-LN
    (reference `Encoder`)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: Optional[int] = 4
    pre_ln: bool = True

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # x: [B, T, C]; x_mask: [B, T, 1]
        attn_mask = (x_mask[:, :, 0])[:, None, :] * (x_mask[:, :, 0])[:, :, None]  # [B, T, T]
        x_mask = x_mask.astype(x.dtype)
        for _ in range(self.n_layers):
            x = x * x_mask
            res = x
            if self.pre_ln:
                x = LayerNorm()(x)
            y = RelMultiHeadAttention(
                self.hidden_channels, self.n_heads, self.window_size, self.p_dropout
            )(x, attn_mask, deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = res + y
            if not self.pre_ln:
                x = LayerNorm()(x)
            res = x
            if self.pre_ln:
                x = LayerNorm()(x)
            y = ConvFFN(
                self.filter_channels, self.hidden_channels, self.kernel_size, self.p_dropout
            )(x, x_mask, deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = res + y
            if not self.pre_ln:
                x = LayerNorm()(x)
        if self.pre_ln:
            x = LayerNorm()(x)
        return x * x_mask


class RelTransformerEncoder(nn.Module):
    """Token embedding (sqrt-H scaled, pad id 0) + optional ConvReluNorm
    prenet + rel-window transformer (reference RelTransformerEncoder)."""

    n_vocab: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 5
    p_dropout: float = 0.0
    window_size: int = 4
    prenet: bool = True
    pre_ln: bool = True

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        # tokens: [B, T] int (0 = pad) -> [B, T, H]
        H = self.hidden_channels
        emb = nn.Embed(self.n_vocab, H, embedding_init=nn.initializers.normal(H**-0.5), dtype=cdtype())
        x = emb(tokens) * math.sqrt(H)  # python scalar: dtype-preserving
        x_mask = (tokens > 0).astype(x.dtype)[:, :, None]
        if self.prenet:
            x = ConvReluNorm(H, H, kernel_size=5, n_layers=3, p_dropout=0.0)(
                x, x_mask, deterministic
            )
        x = RelTransformerLayers(
            H,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            self.window_size,
            self.pre_ln,
        )(x, x_mask, deterministic)
        return x
