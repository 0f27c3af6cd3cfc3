"""Golden-value tests for the JAX STFT/mel against an independent numpy
implementation of the librosa formula (the reference's mel recipe,
/root/reference/data_gen/tts/data_gen_utils.py:122-134)."""

import numpy as np

from dicttts_tpu.ops.mel import (
    gan_log_mel,
    hann_window,
    log10_mel,
    mel_filterbank,
    stft_magnitude,
)


def _np_stft_mag(wav, n_fft, hop, win, center=True, pad_mode="constant"):
    """Reference-formula STFT in plain numpy (no librosa dependency)."""
    window = hann_window(win, periodic=True)
    if center:
        wav = np.pad(wav, (n_fft // 2, n_fft // 2), mode=pad_mode)
    n_frames = 1 + (len(wav) - n_fft) // hop
    frames = np.stack([wav[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.abs(np.fft.rfft(frames * window, n=n_fft, axis=-1))


def test_stft_matches_numpy():
    rng = np.random.RandomState(0)
    wav = rng.randn(22050).astype(np.float32)
    ours = np.asarray(stft_magnitude(wav, 1024, 256, 1024))
    ref = _np_stft_mag(wav, 1024, 256, 1024)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 80.0, 7600.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support; slaney norm keeps peaks modest
    assert (fb.sum(axis=1) > 0).all()
    # triangles are band-limited: no energy below fmin bin or above fmax bin
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs < 75.0].sum() == 0
    assert fb[:, freqs > 7700.0].sum() == 0


def test_log10_mel_shape_and_range():
    rng = np.random.RandomState(1)
    wav = 0.1 * rng.randn(2, 22050).astype(np.float32)
    mel = np.asarray(log10_mel(wav))
    assert mel.shape == (2, 1 + 22050 // 256, 80)
    assert mel.min() >= np.log10(1e-6) - 1e-6
    # silence floors at log10(eps)
    mel_sil = np.asarray(log10_mel(np.zeros(4096, np.float32)))
    np.testing.assert_allclose(mel_sil, np.log10(1e-6), atol=1e-5)


def test_gan_log_mel_framecount_matches_hop():
    wav = np.random.RandomState(2).randn(1, 256 * 40).astype(np.float32) * 0.1
    mel = np.asarray(gan_log_mel(wav))
    # reflect pad (n_fft-hop)/2 both sides, non-centered -> exactly T/hop frames
    assert mel.shape == (1, 40, 80)


def test_mel_linear_in_amplitude():
    # doubling amplitude raises log10 mel by log10(2) where not clamped
    rng = np.random.RandomState(3)
    wav = rng.randn(8192).astype(np.float32)
    m1 = np.asarray(log10_mel(wav))
    m2 = np.asarray(log10_mel(2 * wav))
    mask = m1 > -4  # away from the eps clamp
    np.testing.assert_allclose((m2 - m1)[mask], np.log10(2), atol=1e-4)
