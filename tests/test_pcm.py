"""mu-law PCM round-trip (ops/pcm.py — the bytes-halving serving output)."""

import jax.numpy as jnp
import numpy as np

from dicttts_tpu.ops.pcm import mulaw_decode, mulaw_encode


def test_roundtrip_snr():
    rng = np.random.RandomState(0)
    # speech-like: mostly small amplitudes with occasional peaks
    x = np.tanh(rng.randn(22050).astype(np.float32) * 0.3)
    u = mulaw_encode(jnp.asarray(x))
    assert u.dtype == jnp.uint8
    y = np.asarray(mulaw_decode(u))
    err = x - y
    snr = 10 * np.log10(float((x**2).mean()) / float((err**2).mean() + 1e-12))
    assert snr > 30.0, snr  # G.711-class quality for speech amplitudes


def test_extremes_and_zero():
    x = jnp.asarray(np.asarray([-1.0, -0.5, 0.0, 0.5, 1.0], np.float32))
    y = np.asarray(mulaw_decode(mulaw_encode(x)))
    np.testing.assert_allclose(y, np.asarray(x), atol=0.02)
