"""Device-resident frame cache: the corpus' per-frame arrays ([N, T, 80]
mel + f0/uv) live in train-state (uploaded once, donation-aliased through
steps, excluded from checkpoints) and the jitted step gathers rows by item
index — train batches carry only int32 item_idx plus the small host
arrays. The cache stores the collater's exact transfer dtype, so outputs
must MATCH the streaming host path (same rng => same step)."""

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

MODEL_CFG = dict(
    max_frames=256, max_tokens=4000, max_sentences=4, use_pitch_embed=False,
    hidden_size=16, num_heads=2, enc_ffn_kernel_size=3, dropout=0.0,
    latent_size=4, fvae_enc_dec_hidden=16, fvae_enc_n_layers=1, fvae_dec_n_layers=1,
    prior_glow_hidden=8, prior_glow_n_blocks=1, mel_disc_hidden_size=8,
    disc_win_num=1, warmup_updates=10, mel_loss="l1:1.0", dur_predictor_layers=2,
    frames_multiple=4, mel_buckets=[128, 256], txt_buckets=[16],
    value_embedding_size=30,
)


class _ToyPreAlign(PreAlign):
    def meta_data(self):
        raw = self.cfg["raw_data_dir"]
        for name, text in [("a1", "你好"), ("a2", "天气"), ("a3", "你好天气"),
                           ("a4", "好天气"), ("a5", "天气你好"), ("a6", "好你天气")]:
            yield name, os.path.join(raw, f"{name}.wav"), text


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("framecache")
    raw = root / "raw"
    raw.mkdir()
    dict_path = str(root / "zh-dict.json")
    json.dump(TOY_DICT, open(dict_path, "w"), ensure_ascii=False)
    for i, name in enumerate(["a1", "a2", "a3", "a4", "a5", "a6"]):
        t = np.arange(int(22050 * 0.9)) / 22050
        save_wav(str(raw / f"{name}.wav"), (0.3 * np.sin(2 * np.pi * (180 + 10 * i) * t)).astype(np.float32))
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
    }
    _ToyPreAlign(cfg).process()
    ZhBinarizer(cfg).process()
    return cfg


def _task_and_batch(corpus, frame_cache: bool):
    cfg = dict(corpus, **MODEL_CFG, use_device_frame_cache=frame_cache)
    ds = TTSBinaryDataset(cfg["binary_data_dir"], "train", cfg, kind="dict")
    provider = TTSBatchProvider(ds, cfg, shuffle=False, emit_frame_refs=frame_cache)
    task = DictTTSTask(cfg, provider)
    batch = next(iter(provider.train_batches()))
    batch.pop("_meta")
    return task, batch


def test_frame_ref_batches_carry_no_frame_tensors(corpus):
    _, batch_host = _task_and_batch(corpus, frame_cache=False)
    _, batch_ref = _task_and_batch(corpus, frame_cache=True)
    assert "mels" in batch_host and "mels" not in batch_ref
    assert "item_idx" in batch_ref and batch_ref["item_idx"].dtype == np.int32
    # the alignment array stays host-side (it carries the T_mel bucket)
    assert "mel2word" in batch_ref
    assert np.asarray(batch_ref["item_idx"]).ndim == 1
    host_bytes = sum(np.asarray(v).nbytes for v in batch_host.values())
    ref_bytes = sum(np.asarray(v).nbytes for v in batch_ref.values())
    # mel is the dominant per-frame tensor; dropping it must shrink the batch
    assert ref_bytes < host_bytes - np.asarray(batch_host["mels"]).nbytes // 2


def test_frame_cache_matches_streaming_path(corpus):
    task_h, batch_h = _task_and_batch(corpus, frame_cache=False)
    task_c, batch_c = _task_and_batch(corpus, frame_cache=True)
    state_h = task_h.build_state(jax.random.PRNGKey(0))
    state_c = task_c.build_state(jax.random.PRNGKey(0))
    assert "_const_frame_cache" in state_c and "_const_frame_cache" not in state_h
    # the cache stores the collater's exact transfer dtype: gathered rows
    # are bit-identical to streamed ones, so the whole step must agree
    st_h, m_h = jax.jit(task_h.train_step)(state_h, batch_h, jax.random.PRNGKey(3))
    st_c, m_c = jax.jit(task_c.train_step)(state_c, batch_c, jax.random.PRNGKey(3))
    m_h, m_c = jax.device_get(m_h), jax.device_get(m_c)
    for k in m_h:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_c[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    # the cache rides through the step untouched
    for k, v in st_c["_const_frame_cache"].items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(state_c["_const_frame_cache"][k])
        )


def test_cache_rows_equal_streamed_mels(corpus):
    _, batch_h = _task_and_batch(corpus, frame_cache=False)
    task_c, batch_c = _task_and_batch(corpus, frame_cache=True)
    cache = task_c.data.ds.device_frame_cache(max_frames=MODEL_CFG["max_frames"])
    T = batch_h["mels"].shape[1]
    gathered = cache["mels"][np.asarray(batch_c["item_idx"])][:, :T]
    np.testing.assert_array_equal(gathered.astype(np.float32), batch_h["mels"].astype(np.float32))


def test_frame_cache_matches_streaming_on_padded_sentence_rows(corpus):
    """Regression: sentence-bucket pad rows carry item_idx 0, and the cache
    gather used to hand them item 0's REAL frames where the streamed path
    ships zeros — the nonzero-target loss mask (weights_nonzero_speech
    semantics) then counted those rows as supervision, so every ragged
    trailing batch trained its pad rows toward item 0's mel (l1 spiked to
    ~1.07 in the 60x512 soak). prepare_batch now zeroes gathered frames at
    >= mel_lengths, which is bit-exact for real rows."""
    extra = dict(sentence_buckets=[6])  # 4 train items -> 2 all-zero pad rows
    cfg_h = dict(corpus, **MODEL_CFG, **extra, use_device_frame_cache=False)
    cfg_c = dict(corpus, **MODEL_CFG, **extra, use_device_frame_cache=True)
    ds_h = TTSBinaryDataset(cfg_h["binary_data_dir"], "train", cfg_h, kind="dict")
    ds_c = TTSBinaryDataset(cfg_c["binary_data_dir"], "train", cfg_c, kind="dict")
    prov_h = TTSBatchProvider(ds_h, cfg_h, shuffle=False, emit_frame_refs=False)
    prov_c = TTSBatchProvider(ds_c, cfg_c, shuffle=False, emit_frame_refs=True)
    batch_h = next(iter(prov_h.train_batches()))
    batch_c = next(iter(prov_c.train_batches()))
    batch_h.pop("_meta"), batch_c.pop("_meta")
    assert batch_h["mels"].shape[0] == 6  # padding actually happened
    assert np.all(np.asarray(batch_h["mel_lengths"])[4:] == 0)
    task_h = DictTTSTask(cfg_h, prov_h)
    task_c = DictTTSTask(cfg_c, prov_c)
    state_h = task_h.build_state(jax.random.PRNGKey(0))
    state_c = task_c.build_state(jax.random.PRNGKey(0))
    # the resolved batch must be bit-identical to the streamed one,
    # INCLUDING the pad rows
    resolved = jax.device_get(task_c.prepare_batch(state_c, batch_c))
    np.testing.assert_array_equal(
        np.asarray(resolved["mels"], np.float32),
        np.asarray(batch_h["mels"], np.float32),
    )
    _, m_h = jax.jit(task_h.train_step)(state_h, batch_h, jax.random.PRNGKey(3))
    _, m_c = jax.jit(task_c.train_step)(state_c, batch_c, jax.random.PRNGKey(3))
    m_h, m_c = jax.device_get(m_h), jax.device_get(m_c)
    for k in m_h:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_c[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_trainer_checkpoints_exclude_cache_and_resume(corpus, tmp_path):
    from dicttts_tpu.train.trainer import Trainer
    from dicttts_tpu.utils.checkpoint import get_last_checkpoint

    task, _ = _task_and_batch(corpus, frame_cache=True)
    wd = str(tmp_path / "wd")
    trainer = Trainer(work_dir=wd, max_updates=2, val_check_interval=10**9,
                      num_sanity_val_steps=0, tb_log_interval=10**9, eval_max_batches=1)
    trainer.fit(task)
    ckpt = get_last_checkpoint(wd)
    assert ckpt is not None
    data = open(ckpt, "rb").read()
    assert b"_const_frame_cache" not in data
    # resume path reattaches the cache and continues training
    trainer2 = Trainer(work_dir=wd, max_updates=3, val_check_interval=10**9,
                       num_sanity_val_steps=0, tb_log_interval=10**9, eval_max_batches=1)
    state = trainer2.fit(task)
    assert "_const_frame_cache" in state


def test_scanned_multi_step_dispatch_with_cache(corpus, tmp_path):
    """The K-step scanned dispatch path (steps_per_dispatch>1) stacks
    item_idx [K, B] and gathers per scan slice — must run and advance."""
    from dicttts_tpu.train.trainer import Trainer

    task, _ = _task_and_batch(corpus, frame_cache=True)
    trainer = Trainer(work_dir=str(tmp_path / "wd2"), max_updates=4,
                      val_check_interval=10**9, num_sanity_val_steps=0,
                      tb_log_interval=10**9, eval_max_batches=1,
                      steps_per_dispatch=2)
    state = trainer.fit(task)
    assert int(jax.device_get(state["step"])) == 4
