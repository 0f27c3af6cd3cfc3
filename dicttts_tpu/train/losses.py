"""Loss library: composite mel losses, SSIM, GDL, duration, LSGAN, KL clamp.

Capability parity with the reference loss kit:
- composite mel-loss spec strings "l1:0.5|ssim:0.5"
  (/root/reference/tasks/tts/tts_base.py:57-68,182-222);
- masked L1/MSE where the mask is nonzero-mel frames
  (weights_nonzero_speech semantics);
- SSIM with gaussian window 11/sigma 1.5 on bias-shifted (+6) mels
  (/root/reference/modules/commons/ssim.py:24-83);
- GDL (gradient difference loss, modules/commons/gdl_loss.py);
- word-level log-scale duration loss (tasks/tts/ps_flow.py:99-113);
- LSGAN generator/discriminator MSE losses
  (modules/hifigan/hifigan.py:301-338; tasks/tts/dict_tts.py LSGAN-to-1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.ops.seq import mel2token_to_dur


def parse_mel_loss_spec(spec: str) -> dict[str, float]:
    """'l1:0.5|ssim:0.5' -> {'l1': 0.5, 'ssim': 0.5}."""
    out: dict[str, float] = {}
    for part in spec.split("|"):
        if not part:
            continue
        if ":" in part:
            name, lbd = part.split(":")
            out[name] = float(lbd)
        else:
            out[part] = 1.0
    return out


def nonzero_mel_mask(target: jnp.ndarray) -> jnp.ndarray:
    """[B, T, M] -> [B, T, 1] 1.0 where the frame has any nonzero mel."""
    return (jnp.sum(jnp.abs(target), axis=-1, keepdims=True) > 0).astype(jnp.float32)


def masked_l1(pred, target):
    w = jnp.broadcast_to(nonzero_mel_mask(target), target.shape)
    return jnp.sum(jnp.abs(pred - target) * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_mse(pred, target):
    w = jnp.broadcast_to(nonzero_mel_mask(target), target.shape)
    return jnp.sum(jnp.square(pred - target) * w) / jnp.maximum(jnp.sum(w), 1.0)


@functools.lru_cache(maxsize=2)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)  # separable 2-D window


@functools.lru_cache(maxsize=16)
def _blur_matrix(n: int, window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """[n, n] banded Toeplitz G with G[i, i+k] = g[k+half]: G @ x equals the
    SAME-zero-padded 1-D gaussian conv along that axis. The 11x11 SSIM
    window factorizes as outer(g, g), so the 2-D blur is G_T @ x @ G_M^T —
    two MXU matmuls instead of a single-channel conv2d, which XLA lowers to
    the VPU and which dominated the whole train step (measured 37 of the
    43 ms/step at B=8 x 512 frames; l1-only ran at 6 ms)."""
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    half = window_size // 2
    m = np.zeros((n, n), np.float32)
    for k in range(-half, half + 1):
        m += np.eye(n, k=k, dtype=np.float32) * g[k + half]
    return m


def _ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """SSIM map over [B, T, M] 'images' (single channel)."""
    gt = jnp.asarray(_blur_matrix(int(img1.shape[1]), window_size))
    gm = jnp.asarray(_blur_matrix(int(img1.shape[2]), window_size))

    def conv(x):
        # separable gaussian blur as two banded matmuls (exact transform of
        # the SAME-padded 11x11 conv2d — equivalence-tested); HIGHEST keeps
        # f32 accuracy under the ambient bf16 matmul policy
        y = jnp.einsum("tu,bum->btm", gt, x, precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("mn,btn->btm", gm, y, precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    return ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))


def ssim_loss(pred, target, bias: float = 6.0):
    """1 - SSIM on bias-shifted mels, masked-averaged (reference ssim_loss)."""
    w = jnp.broadcast_to(nonzero_mel_mask(target), target.shape)
    smap = _ssim_map(pred + bias, target + bias)
    return jnp.sum((1.0 - smap) * w) / jnp.maximum(jnp.sum(w), 1.0)


def gdl_loss(pred, target):
    """Gradient-difference loss along time and mel axes, masked."""
    w = nonzero_mel_mask(target)
    dt_p = jnp.abs(pred[:, 1:] - pred[:, :-1])
    dt_t = jnp.abs(target[:, 1:] - target[:, :-1])
    df_p = jnp.abs(pred[:, :, 1:] - pred[:, :, :-1])
    df_t = jnp.abs(target[:, :, 1:] - target[:, :, :-1])
    wt = jnp.broadcast_to(w[:, 1:], dt_p.shape)
    wf = jnp.broadcast_to(w, df_p.shape[:-1] + (1,))
    lt = jnp.sum(jnp.abs(dt_p - dt_t) * wt) / jnp.maximum(jnp.sum(wt), 1.0)
    lf = jnp.sum(jnp.abs(df_p - df_t) * jnp.broadcast_to(wf, df_p.shape)) / jnp.maximum(
        jnp.sum(jnp.broadcast_to(wf, df_p.shape)), 1.0
    )
    return lt + lf


MEL_LOSS_FNS = {"l1": masked_l1, "mse": masked_mse, "ssim": ssim_loss, "gdl": gdl_loss}


def add_mel_losses(spec: dict[str, float], pred, target, losses: dict, postfix: str = ""):
    for name, lbd in spec.items():
        losses[f"{name}{postfix}"] = MEL_LOSS_FNS[name](pred, target) * lbd
    return losses


def word_dur_loss(
    dur_pred: jnp.ndarray,
    mel2word: jnp.ndarray,
    word_lengths: jnp.ndarray,
    dur_scale: str = "log",
) -> jnp.ndarray:
    """L1 between predicted (log-domain) and ground-truth word durations.

    dur_pred: [B, T_w] (log scale); mel2word: [B, T_mel]; word_lengths: [B].
    """
    T = dur_pred.shape[1]
    dur_gt = mel2token_to_dur(mel2word, T).astype(jnp.float32)
    nonpadding = (jnp.arange(T)[None, :] < word_lengths[:, None]).astype(jnp.float32)
    if dur_scale == "log":
        dur_gt = jnp.log(dur_gt + 1.0)
    diff = jnp.abs(dur_pred * nonpadding - dur_gt * nonpadding)
    return jnp.sum(diff) / jnp.maximum(jnp.sum(nonpadding), 1.0)


def lsgan_g_loss(disc_out: jnp.ndarray) -> jnp.ndarray:
    """Generator wants D(fake) -> 1."""
    return jnp.mean(jnp.square(disc_out - 1.0))


def lsgan_d_loss(real_out: jnp.ndarray, fake_out: jnp.ndarray) -> jnp.ndarray:
    """Discriminator: real -> 1, fake -> 0."""
    return jnp.mean(jnp.square(real_out - 1.0)) + jnp.mean(jnp.square(fake_out))


def feature_matching_loss(fmap_real, fmap_fake) -> jnp.ndarray:
    """Mean L1 over all discriminator feature maps (HiFi-GAN feature_loss
    semantics: 2 * sum of per-map means)."""
    total = 0.0
    for fr, ff in zip(jax.tree.leaves(fmap_real), jax.tree.leaves(fmap_fake)):
        total = total + jnp.mean(jnp.abs(fr - ff))
    return 2.0 * total


def clamp_kl(kl: jnp.ndarray, floor: float = 0.002) -> jnp.ndarray:
    """KL clamp (reference tasks/tts/dict_tts.py:74): gradient-stopping floor."""
    return jnp.maximum(kl, floor)
