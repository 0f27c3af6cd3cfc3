"""Non-causal WaveNet stack with gated tanh·sigmoid units and conditioning.

Capability parity with the reference WN
(/root/reference/modules/commons/wavenet.py:5-87), feature-last layout, no
weight norm (folded — see models/layers.py docstring). The conditioning
projection maps g once to 2H·n_layers channels and slices per layer, exactly
like the reference's single cond_layer; the gate is the classic
tanh(a) * sigmoid(b) on the summed input+cond halves.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.ops.amp import cdtype


def gated_unit(x_in: jnp.ndarray, g_l: jnp.ndarray, hidden: int) -> jnp.ndarray:
    a = x_in + g_l
    return jnp.tanh(a[..., :hidden]) * jax.nn.sigmoid(a[..., hidden:])


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int = 1
    n_layers: int = 4
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, deterministic: bool = True):
        # x: [B, T, H]; x_mask: [B, T, 1] or None; g: [B, T, C_g] or None
        H = self.hidden_channels
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        if cdtype() is not None:
            x = x.astype(cdtype())
        x_mask = x_mask.astype(x.dtype)
        if g is not None:
            g = nn.Conv(2 * H * self.n_layers, (1,), name="cond", dtype=cdtype())(g)
        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = nn.Conv(
                2 * H,
                (self.kernel_size,),
                kernel_dilation=(dilation,),
                padding="SAME",
                name=f"in_{i}",
                dtype=cdtype(),
            )(x)
            x_in = nn.Dropout(self.p_dropout)(x_in, deterministic=deterministic)
            g_l = g[..., i * 2 * H : (i + 1) * 2 * H] if g is not None else jnp.zeros_like(x_in)
            acts = gated_unit(x_in, g_l, H)
            if i < self.n_layers - 1:
                res_skip = nn.Conv(2 * H, (1,), name=f"res_skip_{i}", dtype=cdtype())(acts)
                x = (x + res_skip[..., :H]) * x_mask
                output = output + res_skip[..., H:]
            else:
                res_skip = nn.Conv(H, (1,), name=f"res_skip_{i}", dtype=cdtype())(acts)
                output = output + res_skip
        return output * x_mask
