"""Round-3 regression tests: deterministic vocoder validation, size-weighted
val aggregation, joint (two_stage=false) post-glow training, post-glow odd-T
guard, Resemblyzer-spec speaker front-end, max_senses bank guard."""

import os

import jax
import numpy as np
import pytest

from dicttts_tpu.data.datasets import VocoderDataset
from dicttts_tpu.train.trainer import Trainer, _batch_sentences
from dicttts_tpu.utils.indexed_dataset import IndexedDatasetBuilder


def _vocoder_dir(tmp_path, n=8, seed=0):
    rng = np.random.RandomState(seed)
    b = IndexedDatasetBuilder(str(tmp_path / "valid"))
    for i in range(n):
        T = 40 + 13 * i  # all longer than the 16-frame crop window
        b.add_item({
            "wav": rng.randn(T * 64).astype(np.float32),
            "mel": rng.randn(T, 8).astype(np.float32),
        })
    b.finalize()
    return str(tmp_path)


def test_vocoder_val_batches_deterministic(tmp_path):
    """Two consecutive validations must see IDENTICAL batches (fixed crop
    offsets, not a shared advancing RNG — VERDICT r2 weak #4)."""
    cfg = {"hop_size": 64, "max_samples": 1024}
    ds = VocoderDataset(_vocoder_dir(tmp_path), "valid", cfg, batch_size=4)
    # interleave a train epoch to advance the train RNG between the two
    # validation passes — val must not care
    v1 = [jax.tree.map(np.copy, b) for b in ds.val_batches()]
    _ = list(ds.train_batches())
    v2 = list(ds.val_batches())
    assert len(v1) == len(v2) > 0
    for a, b in zip(v1, v2):
        np.testing.assert_array_equal(a["wavs"], b["wavs"])
        np.testing.assert_array_equal(a["mels"], b["mels"])


def test_vocoder_train_batches_vary(tmp_path):
    cfg = {"hop_size": 64, "max_samples": 1024}
    ds = VocoderDataset(_vocoder_dir(tmp_path), "valid", cfg, batch_size=4)
    t1 = [jax.tree.map(np.copy, b) for b in ds.train_batches()]
    t2 = list(ds.train_batches())
    assert any(
        not np.array_equal(a["mels"], b["mels"]) for a, b in zip(t1, t2)
    ), "train crops/shuffles should differ between epochs"


def test_vocoder_wav_mel_crops_aligned(tmp_path):
    cfg = {"hop_size": 64, "max_samples": 1024}
    ds = VocoderDataset(_vocoder_dir(tmp_path), "valid", cfg, batch_size=4)
    for b in ds.val_batches():
        assert b["wavs"].shape[1] == b["mels"].shape[1] * 64


class _FakeEvalTask:
    """Per-batch mean = mean of the batch's item values; exercises the
    size-weighted aggregation path."""

    def __init__(self, batches):
        self._batches = batches

    def val_batches(self):
        return iter([{"mels": np.asarray(b, np.float32)[:, None, None]} for b in self._batches])


def test_evaluate_size_weighted(tmp_path):
    """Val means must be invariant to how the data is partitioned into
    batches (reference meter semantics, tasks/base_task.py:260-292)."""
    import jax.numpy as jnp

    data = np.arange(1, 11, dtype=np.float32)  # nonzero: device-pad rows are 0

    def val_step(state, batch, rng):
        # per-batch mean over TRUE sentences (masked like real tasks)
        m = batch["mels"][:, 0, 0]
        mask = (m != 0).astype(jnp.float32)
        return {"loss": (m * mask).sum() / jnp.maximum(mask.sum(), 1.0)}

    def run(partition):
        tr = Trainer(work_dir=str(tmp_path), mesh=None)
        return tr._evaluate(_FakeEvalTask(partition), {}, val_step, jax.random.PRNGKey(0), sanity=True)

    even = run([data[:5], data[5:]])
    ragged = run([data[:1], data[1:8], data[8:]])
    assert even["loss"] == pytest.approx(ragged["loss"], abs=1e-6)
    assert even["loss"] == pytest.approx(float(data.mean()), abs=1e-6)


def test_batch_sentences_prefers_canonical_keys():
    assert _batch_sentences({"word_lengths": np.zeros(3), "mels": np.zeros((5, 2, 2))}) == 5
    assert _batch_sentences({"anything": np.zeros((7, 2))}) == 7
    assert _batch_sentences({}) == 1


def test_ps_flow_joint_mode_updates_both_partitions():
    """two_stage=false (reference joint mode) must train main AND postflow
    under one optimizer in every step (ADVICE r2 #2)."""
    from dicttts_tpu.train.tasks.ps_flow import PortaSpeechFlowTask
    from tests.test_all_tasks import PS_CFG, _ps_batch
    from tests.test_ps_flow_postglow import PG_CFG, _flat, _split

    cfg = {**PG_CFG, "two_stage": False}
    task = PortaSpeechFlowTask(cfg)
    state = task.build_state(jax.random.PRNGKey(0))
    assert "opt_pf" not in state, "joint mode uses ONE optimizer"
    batch = _ps_batch()
    step = jax.jit(task.train_step)
    p0_main, p0_pf = _split(_flat(state["params_g"]))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(m)
    assert np.isfinite(m["total_loss"]) and "postflow" in m
    p1_main, p1_pf = _split(_flat(state["params_g"]))
    assert any(np.abs(p1_main[k] - p0_main[k]).max() > 0 for k in p0_main)
    assert any(np.abs(p1_pf[k] - p0_pf[k]).max() > 0 for k in p0_pf)


def test_post_glow_rejects_odd_length():
    """squeeze() would silently drop the trailing frame — must fail loudly
    (ADVICE r2 #4)."""
    import jax.numpy as jnp

    from dicttts_tpu.models.post_glow import Glow

    glow = Glow(in_channels=8, hidden_channels=8, kernel_size=3,
                n_blocks=1, n_block_layers=1, n_sqz=2)
    x = jnp.zeros((1, 7, 8))
    with pytest.raises(ValueError, match="n_sqz"):
        glow.init(jax.random.PRNGKey(0), x)


def test_resemblyzer_mel_spec():
    """Resemblyzer front-end: 16 kHz 25ms/10ms power mel, 40 bins, no log."""
    from dicttts_tpu.ops.speaker import resemblyzer_mel

    sr = 22050
    wav = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    m = resemblyzer_mel(wav, sr)
    assert m.shape[1] == 40
    # 1 s of audio -> ~100 frames at 10 ms hop (+1 center-pad frame)
    assert abs(m.shape[0] - 101) <= 2
    assert np.all(m >= 0), "power mel, not log"
    # volume normalization: -30 dBFS RMS on the resampled signal
    assert np.isfinite(m).all()


def test_bank_guard_rejects_too_many_senses(tmp_path):
    """ZhBinarizer must refuse to build a bank whose word has more
    pronunciations than s2pa_max_senses (ADVICE r2 #3)."""
    from dicttts_tpu.text.binarizer import ZhBinarizer

    prons = {f"du{i}": ["gloss"] for i in range(12)}
    toy_dict = {"多": prons}
    import json

    dict_fn = tmp_path / "zh-dict.json"
    dict_fn.write_text(json.dumps(toy_dict, ensure_ascii=False))
    cfg = {
        "binary_data_dir": str(tmp_path / "bin"),
        "dict_path": str(dict_fn),
        "s2pa_max_senses": 10,
        "dict_embed_dim": 8,
    }
    binarizer = ZhBinarizer(cfg)

    class _Enc:
        vocab_size = 3
        id_to_token = {0: "<pad>", 1: "<EOS>", 2: "多"}

    (tmp_path / "bin").mkdir(exist_ok=True)
    with pytest.raises(ValueError, match="s2pa_max_senses"):
        binarizer.gen_dict_embeddings(_Enc(), str(tmp_path / "bin"))


def test_binarizer_multiprocess_fanout_equivalent(tmp_path):
    """binarize_workers=2 (host-side fan-out) must produce byte-identical
    items to the serial path (VERDICT r2 #4)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    from synth_corpus import build_corpus

    from dicttts_tpu.text.binarizer import ZhBinarizer
    from dicttts_tpu.utils.indexed_dataset import IndexedDataset

    root = str(tmp_path / "c")
    bdir = build_corpus(root, n_words=40, n_items=10, min_chars=5, max_chars=9,
                        binarize=False)
    base_cfg = {
        "raw_data_dir": os.path.join(root, "raw"),
        "processed_data_dir": os.path.join(root, "processed"),
        "dict_path": os.path.join(root, "zh-dict.json"),
        "word_size": 43, "dict_embed_dim": 8, "test_num": 2, "valid_num": 2,
        "use_dict": False,  # bank not needed for the fan-out equivalence
        "binarize_batch": 4,
    }
    outs = {}
    for workers in (1, 2):
        cfg = {**base_cfg, "binary_data_dir": str(tmp_path / f"bin{workers}"),
               "binarize_workers": workers}
        ZhBinarizer(cfg).process()
        ds = IndexedDataset(os.path.join(cfg["binary_data_dir"], "train"))
        outs[workers] = [ds[i] for i in range(len(ds))]
    assert len(outs[1]) == len(outs[2]) > 0
    for a, b in zip(outs[1], outs[2]):
        assert a["item_name"] == b["item_name"]
        for key in ("phone", "word_tokens", "mel2ph", "mel2word",
                    "ph2word", "pron_modified"):
            np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]), err_msg=key)
        np.testing.assert_allclose(a["mel"], b["mel"], atol=1e-6)


def test_sentence_bucket_padding(tmp_path):
    """cfg sentence_buckets pads ragged batches to one static shape with
    zero (masked) rows, so trailing batches reuse the compiled graph."""
    from dicttts_tpu.data.datasets import TTSBatchProvider

    class _FakeDS:
        sizes = [32] * 7
        cfg = {}

        class ds:  # no prefetch attr needed
            pass

        def __getitem__(self, i):
            return {
                "txt_tokens": np.arange(1, 9, dtype=np.int64),
                "mels": np.ones((32, 4), np.float32),
                "mel_lengths": np.int32(32),
            }

    cfg = {"max_sentences": 4, "max_tokens": 10**6, "sort_by_len": False,
           "sentence_buckets": [4], "mel_buckets": [32], "txt_buckets": [8]}
    provider = TTSBatchProvider(_FakeDS(), cfg, shuffle=False)
    shapes = set()
    for b in provider.train_batches():
        b.pop("_meta", None)
        shapes.add(b["mels"].shape)
        n_real = int((b["mel_lengths"] > 0).sum())
        # pad rows are all-zero and masked via zero lengths
        assert np.all(b["mels"][n_real:] == 0)
        assert np.all(b["txt_tokens"][n_real:] == 0)
    assert shapes == {(4, 32, 4)}, shapes
