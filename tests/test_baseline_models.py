import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.models.fastspeech2 import FS_DECODERS, FS_ENCODERS, FastSpeech2
from dicttts_tpu.models.portaspeech import PortaSpeech
from dicttts_tpu.ops.pitch import denorm_f0, f0_to_coarse, norm_f0, norm_interp_f0


def test_f0_to_coarse_buckets():
    f0 = np.array([0.0, 50.0, 300.0, 1100.0, 2000.0])
    c = f0_to_coarse(f0)
    assert c[0] == 1  # unvoiced floors at 1
    assert c[1] == 1 and c[3] == 255 and c[4] == 255
    assert 1 < c[2] < 255


def test_f0_norm_roundtrip():
    f0 = np.array([100.0, 200.0])
    n = norm_f0(f0, None, "log")
    d = denorm_f0(n, None, "log")
    np.testing.assert_allclose(d, f0, rtol=1e-5)
    n2 = norm_f0(f0, None, "standard", mean=150.0, std=50.0)
    np.testing.assert_allclose(denorm_f0(n2, None, "standard", mean=150.0, std=50.0), f0, rtol=1e-5)


def test_norm_interp_f0_fills_gaps():
    f0 = np.array([0.0, 100.0, 0.0, 200.0, 0.0])
    fn, uv = norm_interp_f0(f0, "log")
    np.testing.assert_array_equal(uv, [1, 0, 1, 0, 1])
    assert np.isfinite(fn).all()  # no -inf from log(0)


def test_registries_populated():
    assert {"fft", "rel_fft"} <= set(FS_ENCODERS)
    assert {"fft", "conv", "wn"} <= set(FS_DECODERS)


def _fs2(enc="fft", dec="fft"):
    return FastSpeech2(
        n_vocab=30, hidden_size=32, enc_layers=1, dec_layers=1,
        encoder_type=enc, decoder_type=dec, predictor_dropout=0.0,
        dur_predictor_layers=2, use_pitch_embed=True,
    )


def test_fastspeech2_train_and_infer():
    model = _fs2()
    tokens = jnp.array([[3, 4, 5, 0], [6, 7, 0, 0]])
    mel2ph = jnp.array([[1, 1, 2, 3, 0, 0]] * 2)
    f0 = jnp.zeros((2, 6))
    uv = jnp.zeros((2, 6))
    params = model.init(jax.random.PRNGKey(0), tokens, mel2ph, f0=f0, uv=uv)
    out = model.apply(params, tokens, mel2ph, f0=f0, uv=uv)
    assert out["mel_out"].shape == (2, 6, 80)
    assert out["dur"].shape == (2, 4)
    # inference with predicted durations at static max_frames
    out_i = model.apply(params, tokens, infer=True, max_frames=16)
    assert out_i["mel_out"].shape == (2, 16, 80)
    assert np.isfinite(np.asarray(out_i["mel_out"])).all()


def test_fastspeech2_alt_decoders():
    for dec in ["conv", "wn"]:
        model = _fs2(dec=dec)
        tokens = jnp.array([[3, 4, 0]])
        mel2ph = jnp.array([[1, 2, 2, 0]])
        params = model.init(jax.random.PRNGKey(0), tokens, mel2ph, f0=jnp.zeros((1, 4)), uv=jnp.zeros((1, 4)))
        out = model.apply(params, tokens, mel2ph, f0=jnp.zeros((1, 4)), uv=jnp.zeros((1, 4)))
        assert out["mel_out"].shape == (1, 4, 80)


def test_portaspeech_train_and_infer():
    model = PortaSpeech(
        n_vocab=30, hidden_size=32, enc_layers=1, word_enc_layers=1,
        fvae_enc_dec_hidden=32, fvae_enc_n_layers=1, fvae_dec_n_layers=1,
        latent_size=4, prior_flow_hidden=8, prior_flow_n_blocks=1,
        predictor_dropout=0.0, dropout=0.0,
    )
    tokens = jnp.array([[3, 4, 5, 6, 0, 0]])
    ph2word = jnp.array([[1, 1, 2, 2, 0, 0]])
    mel2word = jnp.array([[1, 1, 1, 2, 2, 2, 2, 2, 0, 0, 0, 0]])
    mels = jnp.zeros((1, 12, 80)).at[:, :8].set(1.0)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, tokens, ph2word, 3, mel2word=mel2word, tgt_mels=mels)
    out = model.apply(
        params, tokens, ph2word, 3, mel2word=mel2word, tgt_mels=mels,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    assert out["mel_out"].shape == (1, 12, 80)
    assert np.isfinite(float(out["kl"]))
    # word-frame attention only attends within the same word
    attn = np.asarray(out["attn"])[0]  # [T_mel, T_ph]
    assert attn[0, :2].sum() > 0.99  # frame of word1 attends to ph 0-1
    assert attn[0, 2:].sum() < 1e-3
    out_i = model.apply(
        params, tokens, ph2word, 3, infer=True, max_frames=16,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert out_i["mel_out"].shape == (1, 16, 80)


def test_conformer_registry_entry():
    model = _fs2(enc="conformer", dec="conformer")
    tokens = jnp.array([[3, 4, 5, 0]])
    mel2ph = jnp.array([[1, 2, 2, 3, 0, 0]])
    params = model.init(
        jax.random.PRNGKey(0), tokens, mel2ph, f0=jnp.zeros((1, 6)), uv=jnp.zeros((1, 6))
    )
    out = model.apply(params, tokens, mel2ph, f0=jnp.zeros((1, 6)), uv=jnp.zeros((1, 6)))
    assert out["mel_out"].shape == (1, 6, 80)
    assert np.isfinite(np.asarray(out["mel_out"])).all()
