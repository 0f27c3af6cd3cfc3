"""FastSpeech-style FFT transformer blocks with sinusoidal positions.

Capability parity with the reference FFTBlocks / EncSALayer stack
(/root/reference/modules/fastspeech/tts_modules.py:458-566,
modules/commons/common_layers.py:93-152,620+), batch-first [B, T, C]
(the reference is T×B×C fairseq layout — a CPU/GPU-era artifact with no
benefit on TPU): sinusoidal positional embedding scaled by a learned alpha,
then n layers of pre-LN [self-attention, conv FFN (kernel 9, relu/gelu)]
with padding re-masked between sublayers.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.models.layers import LayerNorm, RelMultiHeadAttention
from dicttts_tpu.ops.amp import cdtype


def sinusoidal_positions(length: int, dim: int, offset: int = 1) -> np.ndarray:
    """Fairseq-style sinusoid table [length, dim] (positions start at
    ``offset`` because 0 is the pad position)."""
    half = dim // 2
    emb = math.log(10000.0) / max(half - 1, 1)
    freqs = np.exp(np.arange(half) * -emb)
    pos = np.arange(offset, offset + length)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((length, 1))], axis=1)
    return table.astype(np.float32)


class SinusoidalPosEmb(nn.Module):
    """Positional embedding with a learned scale alpha (reference
    FFTBlocks: pos_embed_alpha * SinusoidalPositionalEmbedding)."""

    dim: int

    @nn.compact
    def __call__(self, nonpadding: jnp.ndarray) -> jnp.ndarray:
        # nonpadding: [B, T] -> positions [B, T, dim] (pad rows zeroed)
        T = nonpadding.shape[1]
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        table = jnp.asarray(sinusoidal_positions(T, self.dim))
        return alpha * table[None] * nonpadding[:, :, None]


class FFTBlocks(nn.Module):
    hidden_size: int
    n_layers: int
    ffn_kernel_size: int = 9
    n_heads: int = 2
    dropout: float = 0.1
    use_pos_embed: bool = True
    ffn_act: str = "gelu"

    @nn.compact
    def __call__(self, x, nonpadding: Optional[jnp.ndarray] = None, deterministic: bool = True):
        # x: [B, T, C]; nonpadding: [B, T]
        if cdtype() is not None:
            x = x.astype(cdtype())
        if nonpadding is None:
            nonpadding = (jnp.sum(jnp.abs(x), axis=-1) > 0)
        nonpadding = nonpadding.astype(x.dtype)
        mask = nonpadding[:, :, None]
        if self.use_pos_embed:
            x = x + SinusoidalPosEmb(self.hidden_size)(nonpadding).astype(x.dtype)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        attn_mask = nonpadding[:, None, :] * nonpadding[:, :, None]
        for i in range(self.n_layers):
            x = x * mask
            res = x
            h = LayerNorm(name=f"ln1_{i}")(x)
            h = RelMultiHeadAttention(
                self.hidden_size, self.n_heads, window_size=None, p_dropout=0.0, name=f"attn_{i}"
            )(h, attn_mask, deterministic)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            x = (res + h) * mask
            res = x
            h = LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Conv(self.hidden_size * 4, (self.ffn_kernel_size,), padding="SAME", name=f"ffn1_{i}", dtype=cdtype())(h * mask)
            if self.ffn_act == "gelu":
                h = nn.gelu(h)
            else:
                h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Dense(self.hidden_size, name=f"ffn2_{i}", dtype=cdtype())(h)
            x = (res + h) * mask
        return LayerNorm(name="ln_out")(x) * mask
