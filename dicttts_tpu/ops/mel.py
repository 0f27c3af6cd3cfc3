"""STFT and log-mel spectrograms in pure JAX (XLA FFT), librosa-formula parity.

The reference extracts mels host-side with librosa
(/root/reference/data_gen/tts/data_gen_utils.py:93-147): centered STFT with a
periodic Hann window and ``pad_mode="constant"``, magnitude, Slaney-scaled
mel filterbank, then log10(max(eps, mel)). We reproduce that formula exactly
(the filterbank is computed in numpy once and closed over) but run the
FFT/matmul batched on device — this is BASELINE config #2 (batched binarize).

Also provides the torch-free equivalent of the reference's GAN-side mel
(/root/reference/modules/hifigan/mel_utils.py:45-80): reflect-padded,
non-centered frames with natural-log dynamic-range compression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


def _hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(mel, htk: bool = False):
    mel = np.asarray(mel, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mel
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mel >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (mel - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1], librosa.filters.mel math."""
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2), htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def frame_signal(wav: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Slice an already-padded [..., T] signal into [..., frames, n_fft]."""
    n_frames = 1 + (wav.shape[-1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return wav[..., idx]


def stft_magnitude(
    wav: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    center: bool = True,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """|STFT| of [..., T] -> [..., frames, n_fft//2+1]."""
    window = jnp.asarray(hann_window(win_length, periodic=True))
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    if center:
        pads = [(0, 0)] * (wav.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        wav = jnp.pad(wav, pads, mode="reflect" if pad_mode == "reflect" else "constant")
    frames = frame_signal(wav, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec)


def log10_mel(
    wav: jnp.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    fmin: float = 80.0,
    fmax: float = 7600.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Binarizer-formula log10 mel of [..., T] -> [..., frames, n_mels].

    Matches librosa stft(pad_mode='constant') @ slaney mel basis, log10-
    clamped at eps (reference data_gen_utils.py:122-134).
    """
    spc = stft_magnitude(wav, n_fft, hop, win_length, center=True, pad_mode="constant")
    basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("...tf,mf->...tm", spc, basis)
    return jnp.log10(jnp.maximum(eps, mel))


def gan_log_mel(
    wav: jnp.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    fmin: float = 80.0,
    fmax: float = 7600.0,
    clip_val: float = 1e-5,
) -> jnp.ndarray:
    """Training-loss mel used by HiFi-GAN (reference mel_utils.py:45-80):
    reflect pad by (n_fft-hop)/2, non-centered frames, ln-compressed."""
    pad = (n_fft - hop) // 2
    pads = [(0, 0)] * (wav.ndim - 1) + [(pad, pad)]
    wav = jnp.pad(wav, pads, mode="reflect")
    spc = stft_magnitude(wav, n_fft, hop, win_length, center=False)
    basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("...tf,mf->...tm", spc, basis)
    return jnp.log(jnp.clip(mel, min=clip_val))


def librosa_pad_lr(x_len: int, fsize: int, fshift: int) -> tuple[int, int]:
    """Right-pad so the signal tiles exactly into hop-sized frames
    (reference utils/audio.py librosa_pad_lr with pad_sides=1)."""
    pad = (x_len // fshift + 1) * fshift - x_len
    return 0, pad + fsize // 2  # matches (pad+2)//2*2 - pad//2 for even fsize


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft", "hop", "win_length", "n_mels", "fmin", "fmax"))
def batched_log10_mel(wav, sample_rate=22050, n_fft=1024, hop=256, win_length=1024, n_mels=80, fmin=80.0, fmax=7600.0):
    """Jitted batched binarizer mel — the BASELINE config #2 hot path."""
    return log10_mel(wav, sample_rate, n_fft, hop, win_length, n_mels, fmin, fmax)
