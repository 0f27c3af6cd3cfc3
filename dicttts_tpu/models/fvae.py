"""Frame-level VAE mel decoder with a residual-coupling prior flow.

Capability parity with the reference FVAE / FVAE_semantics
(/root/reference/modules/portaspeech/fvae.py and
modules/dict_tts/fvae_semantics.py): a strided conv encoder (latent at
1/prod(strides) frame rate) + WN, a transposed-conv + WN decoder, and an
optional ResidualCouplingBlock prior. The Dict-TTS variant conditions the
*encoder/prior* path on g + semantics while the decoder sees g only — here
both variants are one module (pass semantics=None for the baseline).

KL and flow log-probs are computed in float32 (bf16 hazard, SURVEY.md §7).
Sampling uses flax RNG collection 'sample'.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.flows import ResidualCouplingBlock
from dicttts_tpu.models.wavenet import WN
from dicttts_tpu.ops.amp import cdtype

LOG2PI = math.log(2 * math.pi)


def normal_log_prob(x, mean, log_std):
    return -0.5 * (LOG2PI + 2 * log_std + jnp.exp(-2 * log_std) * jnp.square(x - mean))


def standard_normal_log_prob(x):
    return -0.5 * (LOG2PI + jnp.square(x))


def normal_kl_to_standard(mean, log_std):
    """KL( N(mean, exp(log_std)) || N(0, 1) ), elementwise."""
    return 0.5 * (jnp.exp(2 * log_std) + jnp.square(mean) - 1.0) - log_std


class StridedPreNet(nn.Module):
    """Stack of stride-s convs (kernel 2s, pad s/2): length T -> T/prod(s)."""

    hidden_channels: int
    strides: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate(self.strides):
            x = nn.Conv(
                self.hidden_channels,
                (2 * s,),
                strides=(s,),
                padding=[(s // 2, s // 2)],
                name=f"conv_{i}",
                dtype=cdtype(),
            )(x)
        return x


class TransposedPreNet(nn.Module):
    """Stack of stride-s transposed convs (kernel s): length T -> T*prod(s)."""

    hidden_channels: int
    strides: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate(self.strides):
            x = nn.ConvTranspose(
                self.hidden_channels, (s,), strides=(s,), padding="VALID", name=f"deconv_{i}",
                dtype=cdtype(),
            )(x)
        return x


class FVAEEncoder(nn.Module):
    hidden_channels: int
    latent_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, x, x_mask, g, deterministic: bool = True, noise_scale: float = 1.0):
        # x: [B, T, C_mel]; x_mask: [B, T, 1]; g: [B, T_sqz, C_g]
        stride = 1
        for s in self.strides:
            stride *= s
        x = StridedPreNet(self.hidden_channels, self.strides)(x)
        x_mask_sqz = x_mask[:, ::stride][:, : x.shape[1]].astype(x.dtype)
        x = x * x_mask_sqz
        x = WN(self.hidden_channels, self.kernel_size, 1, self.n_layers, self.gin_channels)(
            x, x_mask_sqz, g, deterministic
        ) * x_mask_sqz
        stats = nn.Conv(2 * self.latent_channels, (1,), name="out_proj", dtype=cdtype())(x)
        m = stats[..., : self.latent_channels].astype(jnp.float32)
        logs = stats[..., self.latent_channels :].astype(jnp.float32)
        eps = jax.random.normal(self.make_rng("sample"), m.shape, dtype=jnp.float32)
        z = m + eps * noise_scale * jnp.exp(logs)
        return z, m, logs, x_mask_sqz


class FVAEDecoder(nn.Module):
    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, z, x_mask, g, deterministic: bool = True):
        # z: [B, T_sqz, C_lat]; x_mask: [B, T, 1] (or scalar 1.0); g: [B, T, C_g]
        x = TransposedPreNet(self.hidden_channels, self.strides)(z)
        x_mask = jnp.asarray(x_mask, x.dtype) if hasattr(x_mask, "astype") else x_mask
        x = x * x_mask
        x = WN(self.hidden_channels, self.kernel_size, 1, self.n_layers, self.gin_channels)(
            x, x_mask, g, deterministic
        ) * x_mask
        return nn.Conv(self.out_channels, (1,), name="out_proj", dtype=cdtype())(x)


class FVAE(nn.Module):
    """Train: (x_recon, loss_kl, z_p, m_q, logs_q); infer: (x_recon, z_p).

    semantics (Dict-TTS FVAE_semantics): extra conditioning added to g for
    the squeezed encoder/prior path only.
    """

    in_out_channels: int
    hidden_channels: int
    latent_size: int
    kernel_size: int
    enc_n_layers: int
    dec_n_layers: int
    gin_channels: int
    strides: Sequence[int] = (4,)
    use_prior_flow: bool = True
    flow_hidden: int = 64
    flow_kernel_size: int = 3
    flow_n_steps: int = 4

    def setup(self):
        self.g_pre_net = StridedPreNet(self.gin_channels, self.strides)
        self.encoder = FVAEEncoder(
            self.hidden_channels,
            self.latent_size,
            self.kernel_size,
            self.enc_n_layers,
            self.gin_channels,
            self.strides,
        )
        self.decoder = FVAEDecoder(
            self.hidden_channels,
            self.in_out_channels,
            self.kernel_size,
            self.dec_n_layers,
            self.gin_channels,
            self.strides,
        )
        if self.use_prior_flow:
            self.prior_flow = ResidualCouplingBlock(
                self.latent_size,
                self.flow_hidden,
                self.flow_kernel_size,
                1,
                self.flow_n_steps,
                4,
                gin_channels=self.gin_channels,
            )

    def __call__(
        self,
        x: Optional[jnp.ndarray] = None,
        x_mask: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
        semantics: Optional[jnp.ndarray] = None,
        infer: bool = False,
        deterministic: bool = True,
        noise_scale: float = 1.0,
    ):
        g_for_sqz = g if semantics is None else g + semantics
        g_sqz = self.g_pre_net(g_for_sqz)
        if not infer:
            z_q, m_q, logs_q, x_mask_sqz = self.encoder(x, x_mask, g_sqz, deterministic, noise_scale)
            x_recon = self.decoder(z_q, x_mask, g, deterministic)
            mask_f32 = x_mask_sqz.astype(jnp.float32)  # KL reductions stay f32
            if self.use_prior_flow:
                logqx = normal_log_prob(z_q, m_q, logs_q)
                z_p = self.prior_flow(
                    z_q.astype(jnp.float32), mask_f32, g_sqz, deterministic=deterministic
                )
                logpx = standard_normal_log_prob(z_p)
                loss_kl = jnp.sum((logqx - logpx) * mask_f32) / jnp.maximum(
                    jnp.sum(mask_f32), 1.0
                ) / logqx.shape[-1]
            else:
                kl = normal_kl_to_standard(m_q, logs_q)
                loss_kl = jnp.sum(kl * mask_f32) / jnp.maximum(jnp.sum(mask_f32), 1.0) / z_q.shape[-1]
                z_p = None
            return x_recon, loss_kl, z_p, m_q, logs_q
        else:
            z_p = noise_scale * jax.random.normal(
                self.make_rng("sample"),
                (g_sqz.shape[0], g_sqz.shape[1], self.latent_size),
                dtype=jnp.float32,
            )
            # mask the decode path with the real frame mask when given: under
            # static max_frames padding, unmasked tail positions carry
            # bias-driven values that bleed into the last valid frames through
            # the WN receptive field — masking reproduces the reference's
            # dynamic-length (batch_size=1) inference exactly.
            if x_mask is None:
                x_mask = jnp.ones_like(g[..., :1])
            stride = 1
            for s in self.strides:
                stride *= s
            x_mask_sqz = x_mask[:, ::stride][:, : g_sqz.shape[1]]
            if self.use_prior_flow:
                z_p = self.prior_flow(z_p, x_mask_sqz, g_sqz, reverse=True)
            x_recon = self.decoder(z_p, x_mask, g, deterministic)
            return x_recon, z_p
