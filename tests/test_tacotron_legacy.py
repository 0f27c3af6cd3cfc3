"""Legacy registry entries resolve and run (reference fs2.py:13-41
alternatives: tacotron/tacotron2 encoders, rnn decoder, BertEncoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicttts_tpu.models.fastspeech2 import FS_DECODERS, FS_ENCODERS, FastSpeech2


@pytest.mark.parametrize("enc", ["tacotron", "tacotron2"])
def test_tacotron_encoders(enc):
    cfg = {"n_vocab": 20, "hidden_size": 16, "dropout": 0.1, "encoder_K": 4, "num_highways": 2}
    m = FS_ENCODERS[enc](cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(1, 20, (2, 9)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), tokens)["params"]
    out = m.apply({"params": params}, tokens)
    assert out.shape == (2, 9, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_rnn_decoder():
    cfg = {"hidden_size": 16, "decoder_rnn_dim": 0, "dropout": 0.0}
    m = FS_DECODERS["rnn"](cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 16), jnp.float32)
    nonpadding = jnp.ones((2, 12))
    params = m.init(jax.random.PRNGKey(0), x, nonpadding)["params"]
    out = m.apply({"params": params}, x, nonpadding)
    assert out.shape == (2, 12, 16)


def test_fs2_with_tacotron_registry():
    m = FastSpeech2(
        n_vocab=20, hidden_size=16, encoder_type="tacotron2", decoder_type="rnn",
        use_pitch_embed=False, predictor_hidden=16, dur_predictor_layers=2,
    )
    B, Tt, Tm = 2, 6, 24
    tokens = jnp.asarray(np.random.RandomState(0).randint(1, 20, (B, Tt)), jnp.int32)
    mel2ph = jnp.asarray(np.repeat(np.arange(1, Tt + 1), Tm // Tt)[None].repeat(B, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), tokens, mel2ph)["params"]
    out = m.apply({"params": params}, tokens, mel2ph)
    assert out["mel_out"].shape == (B, Tm, 80)


def test_bert_encoder_scaffold():
    from dicttts_tpu.models.tacotron import BertEncoderScaffold

    m = BertEncoderScaffold(num_chars=30, hidden_size=16, num_layers=1)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    h, logits = m.apply({"params": params}, x)
    assert h.shape == (2, 8, 16) and logits.shape == (2, 8, 30)
