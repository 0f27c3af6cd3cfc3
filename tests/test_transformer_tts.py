"""TransformerTTS (legacy AR model): teacher-forced pass, scan decode, and
the consistency law between them (the scan decode's own outputs, fed back
teacher-forced, must reproduce the scan outputs exactly when prenet dropout
is off — this is what the reference's incremental_state machinery promises)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicttts_tpu.models.transformer_tts import TransformerTTS


def _model(prenet_dropout=0.0):
    return TransformerTTS(
        vocab_size=30, hidden_size=32, enc_layers=2, dec_layers=2,
        num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
        prenet_hidden_size=16, prenet_dropout=prenet_dropout, mel_bins=8,
        dropout=0.0,
    )


@pytest.fixture(scope="module")
def setup():
    model = _model()
    txt = jnp.asarray([[4, 7, 9, 2, 0, 0], [5, 3, 0, 0, 0, 0]], jnp.int32)
    mels = jnp.asarray(np.random.RandomState(0).randn(2, 12, 8), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        txt, mels,
    )
    return model, params, txt, mels


def test_teacher_forced_shapes(setup):
    model, params, txt, mels = setup
    out = model.apply(params, txt, mels, rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["mel_out"].shape == (2, 12, 8)
    assert out["stop_logits"].shape == (2, 12)
    assert len(out["attn"]) == 2  # per decoder layer
    assert out["attn"][0].shape == (2, 2, 12, 6)  # [B, heads, T_mel, T_txt]
    assert np.all(np.isfinite(np.asarray(out["mel_out"])))


def test_scan_decode_matches_teacher_forced(setup):
    """AR consistency: run the lax.scan decode, then feed ITS OWN mel stream
    through the parallel teacher-forced pass — outputs must agree step for
    step (same weights, dropout off)."""
    model, params, txt, _ = setup
    T = 10
    dec = model.apply(
        params, txt, T, method=TransformerTTS.infer,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    mels = dec["mel_raw"]  # [B, T, M]
    tf = model.apply(params, txt, mels, rngs={"dropout": jax.random.PRNGKey(4)})
    np.testing.assert_allclose(
        np.asarray(tf["mel_out"]), np.asarray(mels), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tf["stop_logits"]), np.asarray(dec["stop_logits"]), rtol=2e-4, atol=2e-5
    )


def test_out_mask_stops_after_eos(setup):
    model, params, txt, _ = setup
    dec = model.apply(
        params, txt, 8, method=TransformerTTS.infer,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    m = np.asarray(dec["out_mask"])
    # once the mask drops to 0 it stays 0 (EOS latches)
    for b in range(m.shape[0]):
        seen_zero = False
        for t in range(m.shape[1]):
            if m[b, t] == 0:
                seen_zero = True
            if seen_zero:
                assert m[b, t] == 0


def test_prenet_dropout_active_at_inference():
    """The reference keeps prenet dropout ON during decode
    (transformer_tts.py:118-123) — different sample keys must give
    different decodes."""
    model = _model(prenet_dropout=0.5)
    txt = jnp.asarray([[4, 7, 9]], jnp.int32)
    mels = jnp.zeros((1, 6, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, txt, mels
    )
    d1 = model.apply(params, txt, 6, method=TransformerTTS.infer,
                     rngs={"sample": jax.random.PRNGKey(1)})
    d2 = model.apply(params, txt, 6, method=TransformerTTS.infer,
                     rngs={"sample": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(d1["mel_raw"]) - np.asarray(d2["mel_raw"])).max() > 1e-6


def test_estimate_decode_length():
    assert TransformerTTS.estimate_decode_length(50) == 500


def test_decode_is_jittable(setup):
    model, params, txt, _ = setup
    f = jax.jit(
        lambda p, t: model.apply(
            p, t, 8, method=TransformerTTS.infer, rngs={"sample": jax.random.PRNGKey(0)}
        )["mel_out"]
    )
    out = f(params, txt)
    assert out.shape == (2, 8, 8)
