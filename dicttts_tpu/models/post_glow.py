"""Post-net Glow: mel-enhancement normalizing flow for PortaSpeechFlow.

The reference gates its second training stage behind
``from modules.glow.glow_modules import Glow``
(/root/reference/modules/portaspeech/model.py:188) — a module that does NOT
exist in the repository, so upstream post-glow cannot run at all. This is a
WORKING TPU-first implementation of the architecture that import points to
(the NATSpeech/PortaSpeech-paper post-net glow: time-squeeze, then
n_blocks x [ActNorm, invertible near-channel 1x1 conv, WN affine coupling]
conditioned on the FVAE reconstruction + text encoding), configured by the
same hparams the reference recipe ships (egs_bases/tts/ps_flow.yaml:37-65:
hidden 192, kernel 3, 12 blocks x 3 WN layers, n_split 4, n_sqz 2,
share_wn_layers 4, sigmoid_scale false).

Design notes (TPU):
- Feature-last [B, T, C]; the time squeeze folds pairs of frames into
  channels (static reshape, no gather).
- Forward (density) and reverse (sampling) are the same parameter set; the
  4x4 InvConvNear inverse is a tiny on-device linalg solve, constant-folded
  by XLA at inference.
- ActNorm uses plain zero-init (data-dependent init is a torch-era trick
  that breaks pure functional init; the flow trains fine without it and the
  reference's own ddi flag defaults off for the post flow).
- Flow numerics stay float32 (repo convention, SURVEY.md §7 hazard #3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.wavenet import WN


def squeeze(x: jnp.ndarray, x_mask: Optional[jnp.ndarray], n_sqz: int = 2):
    """[B, T, C] -> [B, T//n_sqz, C*n_sqz]; frames beyond a multiple of
    n_sqz are dropped (reference glow squeeze semantics)."""
    B, T, C = x.shape
    t = (T // n_sqz) * n_sqz
    x = x[:, :t].reshape(B, t // n_sqz, n_sqz * C)
    if x_mask is not None:
        # a squeezed step is valid only if ALL its frames are valid
        x_mask = x_mask[:, n_sqz - 1 :: n_sqz, :1]
    else:
        x_mask = jnp.ones((B, t // n_sqz, 1), x.dtype)
    return x * x_mask, x_mask


def unsqueeze(x: jnp.ndarray, x_mask: Optional[jnp.ndarray], n_sqz: int = 2):
    """Inverse of squeeze: [B, T', C*n_sqz] -> [B, T'*n_sqz, C]."""
    B, Tq, Cq = x.shape
    x = x.reshape(B, Tq * n_sqz, Cq // n_sqz)
    if x_mask is not None:
        x_mask = jnp.repeat(x_mask, n_sqz, axis=1)
    else:
        x_mask = jnp.ones((B, Tq * n_sqz, 1), x.dtype)
    return x * x_mask, x_mask


class ActNorm(nn.Module):
    """Per-channel affine with exact logdet (zero-init scale/bias)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False):
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        frames = jnp.sum(x_mask, axis=(1, 2))  # [B]
        if not reverse:
            y = (x * jnp.exp(logs) + bias) * x_mask
            logdet = jnp.sum(logs) * frames
        else:
            y = (x - bias) * jnp.exp(-logs) * x_mask
            logdet = -jnp.sum(logs) * frames
        return y, logdet


class InvConvNear(nn.Module):
    """Invertible 1x1 conv over channel groups of size n_split (Glow's
    channel mixing, grouped so the weight stays a tiny dense matrix)."""

    channels: int
    n_split: int = 4

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False):
        B, T, C = x.shape
        S = self.n_split
        w = self.param("weight", nn.initializers.orthogonal(), (S, S))
        frames = jnp.sum(x_mask, axis=(1, 2))
        sign, logabsdet = jnp.linalg.slogdet(w)
        if not reverse:
            mat = w
            logdet = (C // S) * logabsdet * frames
        else:
            mat = jnp.linalg.inv(w)
            logdet = -(C // S) * logabsdet * frames
        # Each S-channel group takes S/2 channels from EACH coupling half so
        # the 1x1 conv mixes information across the halves (otherwise the
        # first half would never be transformed by any coupling layer) —
        # same interleave as the reference-family InvConvNear.
        y = x.reshape(B, T, 2, C // S, S // 2)
        y = jnp.swapaxes(y, 2, 3).reshape(B, T, C // S, S)
        y = y @ mat.T
        y = jnp.swapaxes(y.reshape(B, T, C // S, 2, S // 2), 2, 3).reshape(B, T, C)
        return y * x_mask, logdet


class GlowCoupling(nn.Module):
    """WN affine coupling over the channel halves (x0 conditions x1)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    sigmoid_scale: bool = False
    # optional externally shared WN (share_wn_layers): when set, this module
    # uses it instead of creating its own
    shared_wn: Optional[WN] = None

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * x_mask
        wn = self.shared_wn or WN(
            self.hidden_channels, self.kernel_size, 1, self.n_layers,
            self.gin_channels, name="enc",
        )
        h = wn(h, x_mask, g, deterministic)
        stats = nn.Conv(
            2 * half, (1,), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="post",
        )(h) * x_mask
        m, logs = stats[..., :half], stats[..., half:]
        if self.sigmoid_scale:
            logs = jnp.log(1e-6 + jax.nn.sigmoid(logs + 2.0))
        if not reverse:
            y1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
        else:
            y1 = (x1 - m) * jnp.exp(-logs) * x_mask
            logdet = -jnp.sum(logs * x_mask, axis=(1, 2))
        return jnp.concatenate([x0, y1], axis=-1), logdet


class Glow(nn.Module):
    """n_blocks x [ActNorm, InvConvNear, GlowCoupling] on time-squeezed mels.

    forward: (x, x_mask, g) -> (z, total_logdet)      [density evaluation]
    reverse: (z, x_mask, g, reverse=True) -> (x, 0)   [sampling]

    ``share_wn_layers`` k > 0 shares one WN across each run of k consecutive
    blocks (reference ps_flow.yaml:46 ships k=4: 12 blocks -> 3 WN stacks).
    Conditioning g is squeezed alongside x.
    """

    in_channels: int = 80
    hidden_channels: int = 192
    kernel_size: int = 3
    n_blocks: int = 12
    n_block_layers: int = 3
    n_split: int = 4
    n_sqz: int = 2
    gin_channels: int = 0
    share_wn_layers: int = 0
    sigmoid_scale: bool = False

    def setup(self):
        C = self.in_channels * self.n_sqz
        G = self.gin_channels * self.n_sqz
        shared = {}
        if self.share_wn_layers > 0:
            for s in range(-(-self.n_blocks // self.share_wn_layers)):
                shared[s] = WN(
                    self.hidden_channels, self.kernel_size, 1, self.n_block_layers,
                    G, name=f"shared_wn_{s}",
                )
        blocks = []
        for i in range(self.n_blocks):
            wn = shared.get(i // self.share_wn_layers) if shared else None
            blocks.append(
                (
                    ActNorm(C, name=f"actnorm_{i}"),
                    InvConvNear(C, self.n_split, name=f"invconv_{i}"),
                    GlowCoupling(
                        C, self.hidden_channels, self.kernel_size,
                        self.n_block_layers, G, self.sigmoid_scale,
                        shared_wn=wn, name=f"coupling_{i}",
                    ),
                )
            )
        self.blocks = blocks

    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, in_channels]
        x_mask: Optional[jnp.ndarray] = None,  # [B, T, 1]
        g: Optional[jnp.ndarray] = None,  # [B, T, gin_channels]
        reverse: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from dicttts_tpu.ops.amp import compute_dtype
        with compute_dtype(None):  # f32 island (exact log-dets)
            return self._glow(x, x_mask, g, reverse, deterministic)

    def _glow(self, x, x_mask, g, reverse, deterministic):
        x = jnp.asarray(x, jnp.float32)
        # squeeze() silently DROPS the trailing frames for T % n_sqz != 0
        # and the round trip returns fewer frames than it was given — fail
        # loudly instead of corrupting shapes downstream (ADVICE r2)
        if x.shape[1] % self.n_sqz != 0:
            raise ValueError(
                f"Glow input length {x.shape[1]} not a multiple of n_sqz="
                f"{self.n_sqz}; pad max_frames/frames_multiple accordingly"
            )
        x, x_mask_sqz = squeeze(x, x_mask, self.n_sqz)
        if g is not None:
            g, _ = squeeze(jnp.asarray(g, jnp.float32), x_mask, self.n_sqz)
        total = jnp.zeros((x.shape[0],), jnp.float32)
        order = self.blocks if not reverse else reversed(self.blocks)
        for actnorm, invconv, coupling in order:
            stages = (actnorm, invconv)
            if not reverse:
                for s in stages:
                    x, ld = s(x, x_mask_sqz, reverse=False)
                    total = total + ld
                x, ld = coupling(x, x_mask_sqz, g, reverse=False, deterministic=deterministic)
                total = total + ld
            else:
                x, ld = coupling(x, x_mask_sqz, g, reverse=True, deterministic=deterministic)
                total = total + ld
                for s in reversed(stages):
                    x, ld = s(x, x_mask_sqz, reverse=True)
                    total = total + ld
        x, _ = unsqueeze(x, x_mask_sqz, self.n_sqz)
        return x, total
