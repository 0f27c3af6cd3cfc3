"""HiFi-GAN vocoder: generator + multi-period/multi-scale discriminators.

Capability parity with the reference
(/root/reference/modules/hifigan/hifigan.py:27-338): mel [B, T, 80] ->
waveform [B, T*hop]. Generator = conv_pre(k7) -> 4x [leaky_relu,
transposed-conv upsample (rates 8,8,2,2 / kernels 16,16,4,4), averaged MRF
ResBlock1 stack (kernels 3,7,11; dilations 1,3,5)] -> leaky_relu ->
conv_post(k7) -> tanh. Weight norm is folded (see models/layers.py).

TPU notes: all convs are NWC `lax.conv_general_dilated`; the transposed
conv is expressed as VALID `nn.ConvTranspose` + symmetric crop of
(kernel-stride)/2 so output length is exactly T*stride (the torch
padding=(k-u)//2 arithmetic). The MRF blocks are the RTF hot spot flagged
in SURVEY.md §7 (hard part #6) — kernel-level fusion work happens in
ops/ (Pallas) once this XLA path is benchmarked.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


class UpsampleConv(nn.Module):
    """Upsampling conv with torch-style (k-u)//2 padding: T -> T*stride.

    Computed as a SUBPIXEL convolution: a dense stride-1 conv producing
    `stride` phase-interleaved channel groups, then depth-to-space — exactly
    equivalent to the cropped VALID transposed conv (regression-tested
    against nn.ConvTranspose) but a far better MXU mapping than XLA's
    transposed-conv path (one contiguous GEMM per position instead of
    fractional strides). The parameter keeps the transposed-conv layout
    [k, Cin, Cout]; the phase-gathered kernel is built inside jit (folded
    into the weights by XLA constant propagation at compile time).
    """

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        c = (k - s) // 2
        Cin, Cout = x.shape[-1], self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1), out_axis=2),
            (k, Cin, Cout),
        )
        bias = self.param("bias", nn.initializers.zeros, (Cout,))
        # output n = s*t + j reads input m = t - d at (flipped) tap
        # k-1-(j + c + s*d); collect per-(phase, offset) weight slices
        taps = {}
        d_min, d_max = 10**9, -(10**9)
        for j in range(s):
            for d in range(-(k // s) - 1, k // s + 2):
                tap = j + c + s * d
                if 0 <= tap < k:
                    taps[(j, d)] = k - 1 - tap
                    d_min, d_max = min(d_min, d), max(d_max, d)
        Kp = d_max - d_min + 1
        w_phases = []
        for j in range(s):
            rows = []
            for q in range(Kp):
                d = d_max - q
                rows.append(kernel[taps[(j, d)]] if (j, d) in taps else jnp.zeros((Cin, Cout), kernel.dtype))
            w_phases.append(jnp.stack(rows))  # [Kp, Cin, Cout]
        w_sub = jnp.concatenate(w_phases, axis=-1)  # [Kp, Cin, s*Cout]
        xp = jnp.pad(x, ((0, 0), (d_max, Kp - 1 - d_max), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, w_sub, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
        ) + jnp.tile(bias, s)
        B, T, _ = y.shape
        return y.reshape(B, T, s, Cout).reshape(B, T * s, Cout)


class ResBlock1(nn.Module):
    """MRF residual block: 3x [leaky, dilated conv, leaky, conv d=1] + skip."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(d,), padding="SAME",
                name=f"conv1_{i}",
            )(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME", name=f"conv2_{i}")(h)
            x = x + h
        return x


class ResBlock2(nn.Module):
    """Lighter MRF variant: 2 dilated convs with residual."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(d,), padding="SAME",
                name=f"conv_{i}",
            )(h)
            x = x + h
        return x


class HifiGanGenerator(nn.Module):
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock: str = "1"
    c_out: int = 1

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        # mel: [B, T, 80] -> wav: [B, T*prod(rates)]
        block = ResBlock1 if self.resblock == "1" else ResBlock2
        x = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME", name="conv_pre")(mel)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = UpsampleConv(ch, k, u, name=f"up_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                y = block(ch, rk, tuple(rd), name=f"res_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / len(self.resblock_kernel_sizes)
        x = nn.leaky_relu(x)  # default slope 0.01 like torch F.leaky_relu
        x = nn.Conv(self.c_out, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class DiscriminatorP(nn.Module):
    """Period discriminator: fold the wave into [T/p, p] and run 2-D convs
    (reference DiscriminatorP, hifigan.py:154-198)."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        # wav: [B, T] -> score [B, N], feature maps
        B, T = wav.shape
        pad = (-T) % self.period
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect" if pad and T > 1 else "constant")
        x = x.reshape(B, (T + pad) // self.period, self.period, 1)
        fmap = []
        for i, ch in enumerate([32, 128, 512, 1024]):
            x = nn.Conv(
                ch, (self.kernel_size, 1), strides=(self.stride, 1), padding=((2, 2), (0, 0)),
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding=((2, 2), (0, 0)), name="conv_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator: strided grouped 1-D convs on the raw wave
    (reference DiscriminatorS within MSD, hifigan.py:226-266)."""

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        x = wav[:, :, None]
        fmap = []
        specs = [
            (128, 15, 1, 1),
            (128, 41, 2, 4),
            (256, 41, 2, 16),
            (512, 41, 4, 16),
            (1024, 41, 4, 16),
            (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, g) in enumerate(specs):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="SAME", feature_group_count=g, name=f"conv_{i}"
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(1, (3,), padding="SAME", name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        scores, fmaps = [], []
        for p in self.periods:
            s, f = DiscriminatorP(p, name=f"disc_p{p}")(wav)
            scores.append(s)
            fmaps.append(f)
        return scores, fmaps


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        scores, fmaps = [], []
        x = wav
        for i in range(self.n_scales):
            if i > 0:
                # avg-pool downsample by 2 (kernel 4, stride 2, pad 2)
                x = jnp.pad(x, ((0, 0), (2, 2)))
                x = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, (1, 4), (1, 2), "VALID"
                ) / 4.0
            s, f = DiscriminatorS(name=f"disc_s{i}")(x)
            scores.append(s)
            fmaps.append(f)
        return scores, fmaps


def generator_adv_loss(fake_scores) -> jnp.ndarray:
    """LSGAN: sum over sub-discriminators of mean (D(fake)-1)^2."""
    return sum(jnp.mean(jnp.square(s - 1.0)) for s in fake_scores)


def discriminator_adv_loss(real_scores, fake_scores) -> jnp.ndarray:
    total = 0.0
    for r, f in zip(real_scores, fake_scores):
        total = total + jnp.mean(jnp.square(r - 1.0)) + jnp.mean(jnp.square(f))
    return total
