"""Duration predictor (log-domain) and helpers.

Capability parity with the reference DurationPredictor
(/root/reference/modules/fastspeech/tts_modules.py:82-168, mse branch):
n_layers of [conv-k SAME, relu, LayerNorm, dropout] with padding-mask
re-application after every layer, then a linear head. Output is log(dur +
offset) during training; `out2dur` converts to linear-domain integer frames.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.layers import LayerNorm


class DurationPredictor(nn.Module):
    """softplus_out selects the PortaSpeech-family head (Linear + Softplus,
    reference modules/portaspeech/model.py:56,66 — used with n_chans=128 by
    PortaSpeech/PortaSpeech_dict); False is the FastSpeech2 head
    (tts_modules.py:128, plain linear)."""

    n_chans: int = 384
    n_layers: int = 2
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0
    softplus_out: bool = False

    @nn.compact
    def __call__(self, x, nonpadding, deterministic: bool = True):
        # x: [B, T, C]; nonpadding: [B, T] (1 = real token) -> [B, T] log-dur
        for i in range(self.n_layers):
            x = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME", name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = LayerNorm(eps=1e-5, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
            x = x * nonpadding[:, :, None]
        x = nn.Dense(1, name="out")(x)[..., 0]
        if self.softplus_out:
            x = jax.nn.softplus(x)
        return x * nonpadding

    @staticmethod
    def out2dur(log_dur: jnp.ndarray, offset: float = 1.0) -> jnp.ndarray:
        """log-domain prediction -> non-negative integer frame counts."""
        return jnp.maximum(jnp.round(jnp.exp(log_dur) - offset), 0.0).astype(jnp.int32)
