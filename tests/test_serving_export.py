"""AOT serving export: StableHLO artifacts round-trip and match the live
jitted test path bit-for-bit (same seed, same shapes)."""

import jax
import numpy as np

from dicttts_tpu.serving_export import ExportedTTS, export_tts
from dicttts_tpu.train.tasks.dict_tts import DictTTSTask

TINY = {
    "word_size": 20, "hidden_size": 16, "num_heads": 2, "enc_ffn_kernel_size": 3,
    "dropout": 0.0, "value_embedding_size": 12, "dict_embed_dim": 8,
    "latent_size": 4, "fvae_enc_dec_hidden": 16, "fvae_enc_n_layers": 1,
    "fvae_dec_n_layers": 1, "prior_glow_hidden": 8, "prior_glow_n_blocks": 1,
    "mel_disc_hidden_size": 8, "max_frames": 64, "frames_multiple": 4,
    "audio_num_mel_bins": 80,
}


def _inputs(B, Tw, L=8, P=4, E=8, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        word_tokens=rng.randint(1, 20, (B, Tw)).astype(np.int32),
        keys=rng.randn(B, Tw, L, E).astype(np.float32),
        values=rng.randn(B, Tw, L, E).astype(np.float32),
        key_map=(rng.randint(0, 3, (B, Tw, L)) + (np.arange(L) == 0)).astype(np.int32),
        pinyin=rng.randint(1, 12, (B, Tw, P)).astype(np.int32),
        pinyin_map=np.tile([1, 1, 2, 2], (B, Tw, 1)).astype(np.int32),
        pron_modified=np.zeros((B, Tw), np.int32),
    )


def test_export_roundtrip_matches_live(tmp_path):
    task = DictTTSTask(TINY)
    state = task.build_state(jax.random.PRNGKey(0))
    out_dir = export_tts(
        TINY, state, vocoder=None, buckets=[(2, 8)], gloss_len=8, pinyin_len=4,
        out_dir=str(tmp_path / "export"),
    )
    served = ExportedTTS(out_dir)
    x = _inputs(2, 8)
    mel, mel2word, pinyin_pred = served(**x, seed=3)
    assert mel.shape == (2, 64, 80) and np.isfinite(mel).all()

    # live path, same seed -> identical outputs
    batch = dict(x)
    live = jax.device_get(
        jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(3))
    )
    np.testing.assert_allclose(mel, live["mel_out"], atol=1e-5)
    np.testing.assert_array_equal(mel2word, live["mel2word"])


def test_export_bucket_selection_and_fit(tmp_path):
    task = DictTTSTask(TINY)
    state = task.build_state(jax.random.PRNGKey(0))
    out_dir = export_tts(
        TINY, state, buckets=[(1, 8), (4, 16)], gloss_len=8, pinyin_len=4,
        out_dir=str(tmp_path / "export"),
    )
    served = ExportedTTS(out_dir)
    # B=3, Tw=10 -> bucket (4, 16); result cropped back to B=3
    x = _inputs(3, 10)
    mel, _, _ = served(**x)
    assert mel.shape[0] == 3
    # nothing fits B=8
    import pytest

    with pytest.raises(ValueError, match="no exported bucket"):
        served(**_inputs(8, 8))
