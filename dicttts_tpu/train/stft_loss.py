"""Multi-resolution STFT loss for vocoder training.

Capability parity with /root/reference/modules/hifigan/stft_loss.py:62-130:
at each (fft, hop, win) resolution, spectral convergence
||S_r - S_f||_F / ||S_r||_F plus log-magnitude L1; summed/averaged over the
standard 3 resolutions. Runs on the XLA FFT (ops/mel.py)."""

from __future__ import annotations

import jax.numpy as jnp

from dicttts_tpu.ops.mel import stft_magnitude

DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def spectral_convergence(mag_real: jnp.ndarray, mag_fake: jnp.ndarray) -> jnp.ndarray:
    num = jnp.sqrt(jnp.sum(jnp.square(mag_real - mag_fake)))
    den = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(mag_real))), 1e-8)
    return num / den


def log_stft_magnitude_loss(mag_real: jnp.ndarray, mag_fake: jnp.ndarray) -> jnp.ndarray:
    eps = 1e-7
    return jnp.mean(jnp.abs(jnp.log(mag_real + eps) - jnp.log(mag_fake + eps)))


def stft_loss(wav_real, wav_fake, fft_size=1024, hop=120, win=600):
    mr = stft_magnitude(wav_real, fft_size, hop, win)
    mf = stft_magnitude(wav_fake, fft_size, hop, win)
    return spectral_convergence(mr, mf), log_stft_magnitude_loss(mr, mf)


def multi_resolution_stft_loss(wav_real, wav_fake, resolutions=DEFAULT_RESOLUTIONS):
    sc_total, mag_total = 0.0, 0.0
    for fft_size, hop, win in resolutions:
        sc, mag = stft_loss(wav_real, wav_fake, fft_size, hop, win)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(resolutions)
    return sc_total / n, mag_total / n
