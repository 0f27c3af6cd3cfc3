"""f0 (pitch) extraction by normalized autocorrelation, batched on XLA.

Replaces the reference's parselmouth (Praat C++) autocorrelation pitch
(/root/reference/data_gen/tts/data_gen_utils.py:150-191) with a JAX
implementation so binarization runs batched on the accelerator (BASELINE
config #2). Per frame: normalized ACF via FFT, peak pick in the
[f0_min, f0_max] lag band with parabolic interpolation, voicing decision by
ACF peak height. Output length == mel frame count (hop-aligned).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _frame(wav: jnp.ndarray, frame_len: int, hop: int, n_frames: int) -> jnp.ndarray:
    pad = frame_len // 2
    wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad + frame_len)])
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    return wav[..., idx]


def autocorr_f0(
    wav: jnp.ndarray,
    sample_rate: int = 22050,
    hop: int = 256,
    frame_len: int = 2048,
    f0_min: float = 80.0,
    f0_max: float = 750.0,
    voicing_threshold: float = 0.45,
    n_frames: int | None = None,
) -> jnp.ndarray:
    """wav [..., T] -> f0 [..., n_frames] (0 where unvoiced)."""
    if n_frames is None:
        n_frames = wav.shape[-1] // hop + 1
    frames = _frame(wav, frame_len, hop, n_frames)  # [..., F, L]
    window = jnp.asarray(np.hanning(frame_len).astype(np.float32))
    frames = (frames - jnp.mean(frames, -1, keepdims=True)) * window
    # ACF via FFT (Wiener-Khinchin), normalized by lag-0
    nfft = 2 * frame_len
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., :frame_len]
    acf = acf / jnp.maximum(acf[..., :1], 1e-8)
    # divide out the window's own ACF (Praat's normalized AC method)
    wacf = jnp.fft.irfft(
        jnp.abs(jnp.fft.rfft(window, n=nfft)) ** 2, n=nfft
    )[:frame_len]
    wacf = wacf / jnp.maximum(wacf[0], 1e-8)
    acf = acf / jnp.maximum(wacf, 1e-3)

    lag_min = int(sample_rate / f0_max)
    lag_max = min(int(sample_rate / f0_min), frame_len - 2)
    band = acf[..., lag_min : lag_max + 1]
    peak_rel = jnp.argmax(band, axis=-1)
    peak = peak_rel + lag_min
    peak_val = jnp.take_along_axis(acf, peak[..., None], axis=-1)[..., 0]
    # parabolic interpolation around the peak
    y0 = jnp.take_along_axis(acf, jnp.maximum(peak - 1, 0)[..., None], axis=-1)[..., 0]
    y2 = jnp.take_along_axis(acf, jnp.minimum(peak + 1, frame_len - 1)[..., None], axis=-1)[..., 0]
    denom = y0 - 2 * peak_val + y2
    delta = jnp.where(jnp.abs(denom) > 1e-8, 0.5 * (y0 - y2) / denom, 0.0)
    lag = peak.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)
    f0 = sample_rate / jnp.maximum(lag, 1.0)
    voiced = (peak_val > voicing_threshold) & (f0 >= f0_min) & (f0 <= f0_max)
    # require some energy to call a frame voiced
    energy = jnp.sqrt(jnp.mean(jnp.square(frames), axis=-1))
    voiced = voiced & (energy > 1e-4)
    return jnp.where(voiced, f0, 0.0)


@functools.partial(jax.jit, static_argnames=("sample_rate", "hop", "frame_len", "n_frames"))
def batched_f0(wav, sample_rate=22050, hop=256, frame_len=2048, n_frames=None):
    return autocorr_f0(wav, sample_rate=sample_rate, hop=hop, frame_len=frame_len, n_frames=n_frames)
