"""Multi-window mel discriminator for adversarial acoustic-model training.

Capability parity with the reference
(/root/reference/modules/fastspeech/multi_window_disc.py): for each window
length (32/64/128 frames) a random crop of the (real or fake) mel is scored
by a 3-block stride-2 CNN; `reduction='stack'` returns [B, n_windows]
validities. Differences forced by jit:

- random crop starts are drawn from the step's PRNG key (the reference uses
  numpy RNG, multi_window_disc.py:142) and shared between the fake and real
  passes by passing the same `start_frames`;
- windows longer than the batch's longest sequence are not skipped
  dynamically (shapes must be static) — the caller masks their loss with
  the returned `win_valid` flags instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.ops.amp import cdtype


def instance_norm_2d(x: jnp.ndarray, gamma, beta, eps: float = 1e-5) -> jnp.ndarray:
    """Normalize [B, H, W, C] per (H, W) per channel (stats in f32)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)


class Disc2DBlockStack(nn.Module):
    """3 stride-2 conv blocks + linear head scoring a [B, T_win, M] crop.

    Reference Discriminator2DFactory: conv3x3/stride2/LeakyReLU(0.2)/
    Dropout2d(0.25), instance/batch norm on non-first blocks, linear over
    the flattened [T/8, (M+7)/8] feature map.
    """

    time_length: int
    freq_length: int = 80
    hidden_size: int = 128
    norm_type: str = "in"
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, T_win, M] -> [B, T_win, M, 1]
        h = x[:, :, :, None]
        feats = []
        for i in range(3):
            h = nn.Conv(self.hidden_size, (3, 3), strides=(2, 2), padding=1, name=f"conv_{i}", dtype=cdtype())(h)
            h = nn.leaky_relu(h, 0.2)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            if i > 0 and self.norm_type == "in":
                gamma = self.param(f"in_gamma_{i}", nn.initializers.ones, (self.hidden_size,))
                beta = self.param(f"in_beta_{i}", nn.initializers.zeros, (self.hidden_size,))
                h = instance_norm_2d(h, gamma, beta)
            feats.append(h)
        validity = nn.Dense(1, name="adv")(h.reshape(h.shape[0], -1))  # [B, 1]
        return validity, feats


class JCUDiscriminator(nn.Module):
    """Joint conditional/unconditional discriminator.

    Capability parity with the reference JCU_Discriminator
    (/root/reference/modules/fastspeech/disc_modules.py:6-61): a mel branch
    (reflect-pad stride-2 conv + two k5 convs), a condition branch
    (reflect-pad stride-2 conv), and two heads — conditional (on the
    concatenated features) and unconditional (mel features only). Feature-last
    [B, T, C]; weight norm folded by design (repo convention). NB the
    reference returns ``{'y_c': uncond, 'y': cond}`` — key names kept.
    """

    c_base: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray):
        def refl_stride2(h, name):
            h = jnp.pad(h, ((0, 0), (2, 2), (0, 0)), mode="reflect")
            return nn.Conv(self.c_base, (5,), strides=(2,), padding="VALID", name=name)(h)

        c = nn.leaky_relu(refl_stride2(cond, "cond_conv"), 0.2)
        h = nn.leaky_relu(refl_stride2(x, "x_conv_0"), 0.2)
        h = nn.leaky_relu(nn.Conv(self.c_base, (5,), padding=2, name="x_conv_1")(h), 0.2)
        h = nn.leaky_relu(nn.Conv(self.c_base, (5,), padding=2, name="x_conv_2")(h), 0.2)
        joint = jnp.concatenate([c, h], axis=-1)
        yc = nn.leaky_relu(nn.Conv(self.c_base, (5,), padding=2, name="cond_head_0")(joint), 0.2)
        yc = nn.Conv(1, (3,), padding=1, name="cond_head_1")(yc)
        yu = nn.leaky_relu(nn.Conv(self.c_base, (5,), padding=2, name="x_head_0")(h), 0.2)
        yu = nn.Conv(1, (3,), padding=1, name="x_head_1")(yu)
        return {"y_c": yu, "y": yc}


class MultiWindowDiscriminator(nn.Module):
    time_lengths: Sequence[int] = (32, 64, 128)
    freq_length: int = 80
    hidden_size: int = 128
    norm_type: str = "in"
    reduction: str = "stack"

    @nn.compact
    def __call__(
        self,
        mels: jnp.ndarray,  # [B, T, M]
        lengths: jnp.ndarray,  # [B] frame counts
        start_frames: Optional[jnp.ndarray] = None,  # [n_windows] crop starts
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        T = mels.shape[1]
        max_len = jnp.max(lengths)
        if start_frames is None:
            assert rng is not None, "need an rng to draw crop starts"
            u = jax.random.uniform(rng, (len(self.time_lengths),))
        validities, feats, starts, valid = [], [], [], []
        for i, win in enumerate(self.time_lengths):
            t_end = jnp.maximum(max_len - win, 0)
            if start_frames is None:
                start = jnp.floor(u[i] * (t_end + 1).astype(jnp.float32)).astype(jnp.int32)
            else:
                start = start_frames[i]
            start = jnp.clip(start, 0, max(T - win, 0))
            # batches shorter than the window: pad (win_valid masks the loss)
            src = mels if T >= win else jnp.pad(mels, ((0, 0), (0, win - T), (0, 0)))
            crop = jax.lax.dynamic_slice_in_dim(src, start, win, axis=1)
            v, f = Disc2DBlockStack(
                win, self.freq_length, self.hidden_size, self.norm_type, name=f"win_{win}"
            )(crop, deterministic)
            validities.append(v)
            feats.extend(f)
            starts.append(start)
            valid.append((max_len >= win).astype(jnp.float32))
        validity = jnp.concatenate(validities, axis=-1)  # [B, n_windows] ('stack')
        if self.reduction == "sum":
            validity = jnp.sum(validity, axis=-1, keepdims=True)
        return {
            "y": validity,
            "h": feats,
            "start_frames": jnp.stack(starts),
            "win_valid": jnp.stack(valid),  # [n_windows] 1 if window fits
        }
