"""Residual affine coupling flow used as the FVAE prior.

Capability parity with the reference ResidualCouplingBlock
(/root/reference/modules/portaspeech/glow_modules.py:75-164): n_flows of
[mean-only affine coupling over the channel split + channel flip]. Mean-only
coupling has zero log-determinant, so forward/inverse are exact mirrors.
Kept in float32 regardless of compute dtype elsewhere — flow numerics are
the classic bf16 hazard (SURVEY.md §7 "hard parts" #3).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dicttts_tpu.models.wavenet import WN
from dicttts_tpu.ops.amp import compute_dtype


class ConditionalConvBlocks(nn.Module):
    """Residual conv blocks with additive conditioning — the lighter
    coupling-net alternative to WN (reference SpeedySpeech
    ConditionalConvBlocks used by glow_modules.py:100-103 nn_type='conv')."""

    hidden_channels: int
    kernel_size: int = 3
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        if g is not None:
            x = x + nn.Conv(self.hidden_channels, (1,), name="cond")(g)
        for i in range(self.n_layers):
            res = x
            h = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME", name=f"conv_{i}")(
                x * x_mask
            )
            h = nn.relu(h)
            h = nn.Conv(self.hidden_channels, (1,), name=f"proj_{i}")(h)
            x = (res + h) * x_mask
        return x


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int = 1
    n_layers: int = 4
    gin_channels: int = 0
    mean_only: bool = True
    nn_type: str = "wn"  # 'wn' | 'conv'

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        # x: [B, T, C] with C even; x_mask: [B, T, 1]
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * x_mask
        if self.nn_type == "conv":
            h = ConditionalConvBlocks(
                self.hidden_channels, self.kernel_size, self.n_layers, name="enc"
            )(h, x_mask, g, deterministic)
        else:
            h = WN(
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                self.gin_channels,
                name="enc",
            )(h, x_mask, g, deterministic)
        post = nn.Conv(
            half * (2 - int(self.mean_only)),
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="post",
        )
        stats = post(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
            logdet = -jnp.sum(logs, axis=(1, 2))
        return jnp.concatenate([x0, x1], axis=-1), logdet


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0
    nn_type: str = "wn"

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        # f32 island: flow numerics are the classic bf16 hazard (module
        # docstring) — shield from any outer bf16 activation context and
        # upcast conditioning that arrives in bf16
        with compute_dtype(None):
            return self._flow(x.astype(jnp.float32), x_mask.astype(jnp.float32),
                              None if g is None else g.astype(jnp.float32),
                              reverse, deterministic)

    def _flow(self, x, x_mask, g, reverse, deterministic):
        layers = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                self.gin_channels,
                mean_only=True,
                nn_type=self.nn_type,
                name=f"coupling_{i}",
            )
            for i in range(self.n_flows)
        ]
        order = range(self.n_flows) if not reverse else reversed(range(self.n_flows))
        for i in order:
            if not reverse:
                x, _ = layers[i](x, x_mask, g, reverse=False, deterministic=deterministic)
                x = jnp.flip(x, axis=-1)  # Flip module: reverse channel order
            else:
                x = jnp.flip(x, axis=-1)
                x, _ = layers[i](x, x_mask, g, reverse=True, deterministic=deterministic)
        return x
