"""Conformer blocks for the FastSpeech2 encoder/decoder registry.

Capability parity with the reference's conformer registry entries
(/root/reference/modules/fastspeech/fs2.py:13-41 -> modules/commons/
conformer/): the standard Conformer layer — half-step feed-forward,
self-attention, convolution module (pointwise GLU -> depthwise -> norm ->
swish -> pointwise), half-step feed-forward, final LayerNorm.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.layers import LayerNorm, RelMultiHeadAttention


class ConformerConvModule(nn.Module):
    channels: int
    kernel_size: int = 9
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        h = LayerNorm()(x)
        h = nn.Dense(2 * self.channels)(h)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(
            self.channels, (self.kernel_size,), padding="SAME",
            feature_group_count=self.channels, name="depthwise",
        )(h * mask)
        h = LayerNorm()(h)
        h = nn.swish(h)
        h = nn.Dense(self.channels)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h


class ConformerFF(nn.Module):
    channels: int
    expansion: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = LayerNorm()(x)
        h = nn.Dense(self.channels * self.expansion)(h)
        h = nn.swish(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.channels)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ConformerBlock(nn.Module):
    channels: int
    n_heads: int = 2
    kernel_size: int = 9
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, nonpadding, deterministic: bool = True):
        mask = nonpadding[:, :, None]
        attn_mask = nonpadding[:, None, :] * nonpadding[:, :, None]
        x = x + 0.5 * ConformerFF(self.channels, dropout=self.dropout)(x, deterministic)
        h = LayerNorm()(x)
        h = RelMultiHeadAttention(self.channels, self.n_heads, window_size=None)(
            h, attn_mask, deterministic
        )
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + ConformerConvModule(self.channels, self.kernel_size, self.dropout)(
            x, mask, deterministic
        )
        x = x + 0.5 * ConformerFF(self.channels, dropout=self.dropout)(x, deterministic)
        return LayerNorm()(x) * mask


class ConformerLayers(nn.Module):
    channels: int
    n_layers: int = 4
    n_heads: int = 2
    kernel_size: int = 9
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, nonpadding, deterministic: bool = True):
        for i in range(self.n_layers):
            x = ConformerBlock(
                self.channels, self.n_heads, self.kernel_size, self.dropout, name=f"block_{i}"
            )(x, nonpadding, deterministic)
        return x
