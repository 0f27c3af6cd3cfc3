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


def fold_conv_weights(w: jnp.ndarray, dilation: int, fold: int):
    """SAME dilated conv weights [k, Cin, Cout] -> folded-lane weights
    [K', fold*Cin, fold*Cout] (+ left/right pads): a conv over
    [B, T/fold, fold*Cin] that is EXACTLY the original conv over [B, T, Cin]
    followed by time-folding. Folding multiplies the lane dimension so
    small-channel wave-resolution convs fill the TPU's 128 lanes instead of
    wasting 2-4x of every vector op (stages 3/4 of HiFi-GAN run at C=64/32).
    """
    k, Cin, Cout = w.shape
    c = (k - 1) // 2
    offs = [(j - c) * dilation for j in range(k)]
    qs = [(fo + off) // fold for fo in range(fold) for off in offs]
    q_min, q_max = min(qs), max(qs)
    parts = {}
    for fo in range(fold):
        for j, off in enumerate(offs):
            q = (fo + off) // fold - q_min
            fi = (fo + off) % fold
            parts[(q, fi, fo)] = w[j]
    Wp = jnp.zeros((q_max - q_min + 1, fold * Cin, fold * Cout), w.dtype)
    for (q, fi, fo), wj in parts.items():
        Wp = Wp.at[q, fi * Cin : (fi + 1) * Cin, fo * Cout : (fo + 1) * Cout].set(wj)
    return Wp, -q_min, q_max


def folded_conv(xf: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray, dilation: int, fold: int) -> jnp.ndarray:
    """Apply a SAME dilated conv to a lane-folded signal [B, T/fold, fold*C]."""
    Wp, left, right = fold_conv_weights(w, dilation, fold)
    xp = jnp.pad(xf, ((0, 0), (left, right), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, Wp, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
    )
    return y + jnp.tile(bias, fold)


class ResBlock1(nn.Module):
    """MRF residual block: 3x [leaky, dilated conv, leaky, conv d=1] + skip.

    `fold` > 1 runs the block on a lane-folded signal [B, T/fold, fold*C]
    using exactly-equivalent folded weights (see fold_conv_weights)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        C, k = self.channels, self.kernel_size
        init = nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2)
        for i, d in enumerate(self.dilations):
            w1 = self.param(f"conv1_{i}_kernel", init, (k, C, C))
            b1 = self.param(f"conv1_{i}_bias", nn.initializers.zeros, (C,))
            w2 = self.param(f"conv2_{i}_kernel", init, (k, C, C))
            b2 = self.param(f"conv2_{i}_bias", nn.initializers.zeros, (C,))
            h = nn.leaky_relu(x, LRELU_SLOPE)
            if self.fold > 1:
                h = folded_conv(h, w1, b1, d, self.fold)
                h = nn.leaky_relu(h, LRELU_SLOPE)
                h = folded_conv(h, w2, b2, 1, self.fold)
            else:
                h = jax.lax.conv_general_dilated(
                    h, w1, (1,), "SAME", rhs_dilation=(d,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                ) + b1
                h = nn.leaky_relu(h, LRELU_SLOPE)
                h = jax.lax.conv_general_dilated(
                    h, w2, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
                ) + b2
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
    """mel [B, T, 80] -> wav [B, T*prod(rates)].

    `fold_lanes`: run late stages (channel count < 128) on lane-folded
    signals — the time axis is reshaped into channels so the VPU/MXU lanes
    stay full. Exactly equivalent math (see fold_conv_weights); measured
    necessity: unfolded stages at C=32/64 waste 4x/2x of every vector op.
    Enabled by default; folds must divide the stage length, which
    frames_multiple=4-aligned mels guarantee.
    """

    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock: str = "1"
    c_out: int = 1
    fold_lanes: bool = True
    lane_width: int = 128

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        block = ResBlock1 if self.resblock == "1" else ResBlock2
        x = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME", name="conv_pre")(mel)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = UpsampleConv(ch, k, u, name=f"up_{i}")(x)
            fold = 1
            if self.fold_lanes and self.resblock == "1" and ch < self.lane_width:
                fold = self.lane_width // ch
                B, T, _ = x.shape
                fold = min(fold, T)  # tiny-input safety
                while T % fold:
                    fold //= 2
                if fold > 1:
                    x = x.reshape(B, T // fold, fold * ch)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                y = block(ch, rk, tuple(rd), fold=fold, name=f"res_{i}_{j}")(x) if self.resblock == "1" else block(ch, rk, tuple(rd), name=f"res_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / len(self.resblock_kernel_sizes)
            last_stage = i == len(self.upsample_rates) - 1
            if fold > 1 and not last_stage:
                B, Tf, _ = x.shape
                x = x.reshape(B, Tf * fold, ch)
            elif last_stage:
                final_fold = fold
        x = nn.leaky_relu(x)  # default slope 0.01 like torch F.leaky_relu
        init = nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2)
        w_post = self.param("conv_post_kernel", init, (7, ch, self.c_out))
        b_post = self.param("conv_post_bias", nn.initializers.zeros, (self.c_out,))
        if final_fold > 1:
            # stay folded through the output conv (full lanes), unfold once
            x = folded_conv(x, w_post, b_post, 1, final_fold)
            B, Tf, _ = x.shape
            x = x.reshape(B, Tf * final_fold, self.c_out)
        else:
            x = jax.lax.conv_general_dilated(
                x, w_post, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
            ) + b_post
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
