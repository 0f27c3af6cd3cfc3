"""Multi-speaker path end-to-end: adapter spk labels -> binarizer spk_map ->
dataset spk_ids -> speaker-conditioned DictTTS training step
(VERDICT round-1 missing #4 / next #6)."""

import json
import os

import jax
import numpy as np
import pytest

from dicttts_tpu.data.datasets import TTSBatchProvider, TTSBinaryDataset
from dicttts_tpu.text.binarizer import PreAlign, ZhBinarizer
from dicttts_tpu.train.tasks.dict_tts import DictTTSTask
from dicttts_tpu.vocoders.hifigan import save_wav

TOY_DICT = {
    "你": {"nǐ": ["代词。称对方。"]},
    "好": {"hǎo": ["优点多的。"], "hào": ["喜爱。"]},
    "天": {"tiān": ["日。"]},
    "气": {"qì": ["流体。"]},
}


class TwoSpeakerPreAlign(PreAlign):
    def meta_data(self):
        raw = self.cfg["raw_data_dir"]
        for name, text, spk in [
            ("a1", "你好", "spk_a"), ("a2", "天气", "spk_a"),
            ("b1", "你好天气", "spk_b"), ("b2", "好天气", "spk_b"),
            ("a3", "天气你好", "spk_a"), ("b3", "好你天气", "spk_b"),
        ]:
            yield name, os.path.join(raw, f"{name}.wav"), text, spk


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("msp")
    raw = root / "raw"
    raw.mkdir()
    dict_path = str(root / "zh-dict.json")
    json.dump(TOY_DICT, open(dict_path, "w"), ensure_ascii=False)
    rng = np.random.RandomState(0)
    for name in ["a1", "a2", "a3", "b1", "b2", "b3"]:
        t = np.arange(int(22050 * 0.9)) / 22050
        wav = 0.3 * np.sin(2 * np.pi * (180 if name[0] == "a" else 260) * t)
        save_wav(str(raw / f"{name}.wav"), wav.astype(np.float32))
    cfg = {
        "raw_data_dir": str(raw),
        "processed_data_dir": str(root / "processed"),
        "binary_data_dir": str(root / "binary"),
        "dict_path": dict_path,
        "word_size": 50,
        "dict_embed_dim": 16,
        "test_num": 1,
        "valid_num": 1,
        "use_dict": True,
        "use_spk_id": True,
        "num_spk": 2,
        "with_spk_embed": True,
        "binarize_batch": 4,
    }
    TwoSpeakerPreAlign(cfg).process()
    ZhBinarizer(cfg).process()
    return cfg


def test_spk_map_built_from_adapter(corpus):
    spk_map = json.load(open(os.path.join(corpus["binary_data_dir"], "spk_map.json")))
    assert spk_map == {"spk_a": 0, "spk_b": 1}


def test_items_carry_spk_ids_and_embeds(corpus):
    ds = TTSBinaryDataset(corpus["binary_data_dir"], "train", dict(corpus, max_frames=256), kind="dict")
    ids = set()
    for i in range(len(ds)):
        s = ds[i]
        assert "spk_ids" in s
        ids.add(int(s["spk_ids"]))
        assert ds.ds[i]["spk_embed"].shape == (256,)
    assert len(ids) == 2  # both speakers present in train


def test_multispeaker_train_step(corpus):
    cfg = dict(
        corpus,
        max_frames=256, max_tokens=4000, max_sentences=4, use_pitch_embed=False,
        hidden_size=16, num_heads=2, enc_ffn_kernel_size=3, dropout=0.0,
        latent_size=4, fvae_enc_dec_hidden=16, fvae_enc_n_layers=1, fvae_dec_n_layers=1,
        prior_glow_hidden=8, prior_glow_n_blocks=1, mel_disc_hidden_size=8,
        disc_win_num=1, warmup_updates=10, mel_loss="l1:1.0", dur_predictor_layers=2,
        frames_multiple=4, mel_buckets=[128, 256], txt_buckets=[16],
        value_embedding_size=30,
    )
    ds = TTSBinaryDataset(cfg["binary_data_dir"], "train", cfg, kind="dict")
    provider = TTSBatchProvider(ds, cfg, shuffle=False)
    task = DictTTSTask(cfg, provider)
    assert task.model.num_spk == 2
    state = task.build_state(jax.random.PRNGKey(0))
    assert "spk_embed_proj" in state["params_g"]
    batch = next(iter(provider.train_batches()))
    batch.pop("_meta")
    assert "spk_ids" in batch and batch["spk_ids"].ndim == 1
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(metrics["total_loss"])))
    out = jax.device_get(jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(2)))
    assert np.isfinite(out["mel_out"]).all()
