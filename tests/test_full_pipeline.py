"""Raw corpus -> pre-align -> binarize -> dataset -> DictTTS train/infer:
the 2-utterance synthetic end-to-end pipeline test (SURVEY.md §4)."""

import json
import os

import jax
import numpy as np
import pytest

from dicttts_tpu.data.datasets import TTSBatchProvider, TTSBinaryDataset
from dicttts_tpu.text.binarizer import BiaobeiPreAlign, ZhBinarizer
from dicttts_tpu.train.tasks.dict_tts import DictTTSTask
from dicttts_tpu.vocoders.hifigan import save_wav

TOY_DICT = {
    "你": {"nǐ": ["代词。称对方。"]},
    "好": {"hǎo": ["优点多的，使人满意的。"], "hào": ["喜爱。"]},
    "天": {"tiān": ["日，太阳升落一次的时间。"]},
    "气": {"qì": ["没有一定形状的流体。"]},
    "很": {"hěn": ["非常，甚。"]},
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    raw = root / "raw"
    (raw / "ProsodyLabeling").mkdir(parents=True)
    (raw / "Wave").mkdir()
    dict_path = str(root / "zh-dict.json")
    json.dump(TOY_DICT, open(dict_path, "w"), ensure_ascii=False)
    texts = {"000001": "你好", "000002": "天气很好", "000003": "你好天气"}
    lines = []
    rng = np.random.RandomState(0)
    for name, text in texts.items():
        lines.append(f"{name}\t{text}")
        lines.append("  (pinyin ignored)")
        dur = 0.7 + 0.2 * len(text)
        t = np.arange(int(22050 * dur)) / 22050
        wav = 0.3 * np.sin(2 * np.pi * 220 * t) * np.hanning(len(t))
        save_wav(str(raw / "Wave" / f"{name}.wav"), wav.astype(np.float32))
    (raw / "ProsodyLabeling" / "000001-010000.txt").write_text("\n".join(lines), encoding="utf-8")
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
        "hop_size": 256,
        "audio_sample_rate": 22050,
    }
    BiaobeiPreAlign(cfg).process()
    ZhBinarizer(cfg).process()
    return cfg


def test_prealign_outputs(corpus):
    proc = corpus["processed_data_dir"]
    assert os.path.exists(os.path.join(proc, "metadata_phone.csv"))
    phones = json.load(open(os.path.join(proc, "phone_set.json")))
    assert "i3" in phones and "t" in phones  # ni3 -> n/i3; tian1 -> t/ian1


def test_binaries_exist(corpus):
    bdir = corpus["binary_data_dir"]
    for fn in ["train.data", "train.idx", "valid.idx", "test.idx",
               "train_lengths.npy", "phone_set.json", "word_set.json",
               "dict_embed.data", "pinyin_encoder.pkl"]:
        assert os.path.exists(os.path.join(bdir, fn)), fn


def test_dataset_items_consistent(corpus):
    cfg = dict(corpus, max_frames=512, use_pitch_embed=False)
    ds = TTSBinaryDataset(cfg["binary_data_dir"], "train", cfg, kind="dict")
    assert len(ds) >= 1
    s = ds[0]
    T = s["mels"].shape[0]
    assert s["mels"].shape[1] == 80
    assert len(s["mel2word"]) == T
    assert s["mel2word"].max() <= len(s["word_tokens"])
    # dict bank aligned to word axis (incl BOS/EOS rows)
    assert s["keys"].shape[0] == len(s["word_tokens"])
    assert s["key_map"].shape[0] == len(s["word_tokens"])
    assert s["pron_modified"].shape[0] == len(s["word_tokens"])
    # alignment covers all frames with valid word ids
    assert (s["mel2word"] > 0).all()


def test_full_train_and_infer_from_binaries(corpus):
    import pickle

    cfg = dict(
        corpus,
        max_frames=512, max_tokens=2000, max_sentences=2, use_pitch_embed=False,
        hidden_size=16, num_heads=2, enc_ffn_kernel_size=3, dropout=0.0,
        latent_size=4, fvae_enc_dec_hidden=16, fvae_enc_n_layers=1, fvae_dec_n_layers=1,
        prior_glow_hidden=8, prior_glow_n_blocks=1, mel_disc_hidden_size=8,
        disc_win_num=1, warmup_updates=10, mel_loss="l1:1.0", dur_predictor_layers=2,
        frames_multiple=4, mel_buckets=[256, 512], txt_buckets=[16, 32],
    )
    with open(os.path.join(cfg["binary_data_dir"], "pinyin_encoder.pkl"), "rb") as f:
        pinyin_vocab = pickle.load(f)
    cfg["value_embedding_size"] = len(pinyin_vocab) + 2
    ds = TTSBinaryDataset(cfg["binary_data_dir"], "train", cfg, kind="dict")
    provider = TTSBatchProvider(ds, cfg, shuffle=False)
    task = DictTTSTask(cfg, provider)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = next(iter(provider.train_batches()))
    batch.pop("_meta")  # host-side metadata; the Trainer strips it before jit
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["total_loss"])
    out = jax.device_get(jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(2)))
    assert np.isfinite(out["mel_out"]).all()
    # pinyin predictions decode through the bank's pinyin ids (2-token window)
    assert out["pinyin_pred"].shape == batch["word_tokens"].shape + (2,)


def test_one_shot_inferencer(corpus, tmp_path):
    import pickle

    cfg = dict(
        corpus,
        max_frames=256, use_pitch_embed=False,
        hidden_size=16, num_heads=2, enc_ffn_kernel_size=3, dropout=0.0,
        latent_size=4, fvae_enc_dec_hidden=16, fvae_enc_n_layers=1, fvae_dec_n_layers=1,
        prior_glow_hidden=8, prior_glow_n_blocks=1, mel_disc_hidden_size=8,
        disc_win_num=1, mel_loss="l1:1.0", dur_predictor_layers=2, frames_multiple=4,
        work_dir=str(tmp_path / "noexist"),
        upsample_initial_channel=16, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]],
    )
    with open(os.path.join(cfg["binary_data_dir"], "pinyin_encoder.pkl"), "rb") as f:
        cfg["value_embedding_size"] = len(pickle.load(f)) + 2
    from dicttts_tpu.infer import DictTTSInferencer

    inf = DictTTSInferencer(cfg)  # random-init state (no ckpt): exercises the path
    wav, info = inf.synthesize("你好天气", out_wav=str(tmp_path / "o.wav"))
    assert len(info["pinyin"]) == 4
    assert info["n_frames"] > 0
    assert wav.shape[0] == info["n_frames"] * 256
    assert os.path.exists(str(tmp_path / "o.wav"))

    # batched serving path: different-length texts, one dispatch, per-item
    # trims and decodes
    results = inf.synthesize_batch(["你好", "你好天气很好"], seed=3)
    assert len(results) == 2
    for (w, i), n_chars in zip(results, (2, 6)):
        assert len(i["pinyin"]) == n_chars
        assert i["n_frames"] > 0
        assert w.shape[0] == i["n_frames"] * 256
        assert np.isfinite(w).all()


def test_cli_provider_device_bank(corpus):
    """Regression: run.py's _Splits wrapper must expose .ds so the device
    dict bank resolves — with use_device_dict_bank the collater omits the
    per-batch keys, and a task that silently falls back KeyErrors in jit."""
    import pickle

    from dicttts_tpu.run import build_data_provider

    cfg = dict(
        corpus,
        use_device_dict_bank=True, use_pitch_embed=False, max_frames=256,
        hidden_size=16, num_heads=2, enc_ffn_kernel_size=3, dropout=0.0,
        latent_size=4, fvae_enc_dec_hidden=16, fvae_enc_n_layers=1,
        fvae_dec_n_layers=1, prior_glow_hidden=8, prior_glow_n_blocks=1,
        mel_disc_hidden_size=8, disc_win_num=1, mel_loss="l1:1.0",
        dur_predictor_layers=2, frames_multiple=4,
        mel_buckets=[256], txt_buckets=[16],
    )
    with open(os.path.join(cfg["binary_data_dir"], "pinyin_encoder.pkl"), "rb") as f:
        cfg["value_embedding_size"] = len(pickle.load(f)) + 2
    data = build_data_provider(cfg, "dicttts_tpu.train.tasks.dict_tts.DictTTSTask", 1)
    task = DictTTSTask(cfg, data)
    assert task.use_device_bank, "device bank must resolve through the CLI provider"
    state = task.build_state(jax.random.PRNGKey(0))
    assert "_const_dict_bank" in state
    batch = next(iter(data.train_batches()))
    batch.pop("_meta", None)
    assert "keys" not in batch  # the bank replaces per-batch gloss tensors
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(metrics["total_loss"])))

    # without a bank-capable provider the task must refuse loudly
    class NoDs:
        pass

    with pytest.raises(ValueError):
        DictTTSTask(cfg, NoDs())


def test_amp_f16_transfer_on_mesh(corpus):
    """The f16 mel transfer format must survive the 8-device mesh path:
    collate (f16 under amp) -> pad -> shard -> jitted step upcasts on
    device and trains."""
    import pickle

    from dicttts_tpu.parallel.mesh import make_mesh, pad_batch_to_devices, shard_batch

    cfg = dict(
        corpus,
        amp=True, use_pitch_embed=False, max_frames=256,
        hidden_size=16, num_heads=2, enc_ffn_kernel_size=3, dropout=0.0,
        latent_size=4, fvae_enc_dec_hidden=16, fvae_enc_n_layers=1,
        fvae_dec_n_layers=1, prior_glow_hidden=8, prior_glow_n_blocks=1,
        mel_disc_hidden_size=8, disc_win_num=1, mel_loss="ssim:0.5|l1:0.5",
        dur_predictor_layers=2, frames_multiple=4,
        mel_buckets=[256], txt_buckets=[16],
    )
    with open(os.path.join(cfg["binary_data_dir"], "pinyin_encoder.pkl"), "rb") as f:
        cfg["value_embedding_size"] = len(pickle.load(f)) + 2
    ds = TTSBinaryDataset(cfg["binary_data_dir"], "train", cfg, kind="dict")
    provider = TTSBatchProvider(ds, cfg, shuffle=False)
    task = DictTTSTask(cfg, provider)
    batch = next(iter(provider.train_batches()))
    batch.pop("_meta", None)
    assert batch["mels"].dtype == np.float16  # transfer format under amp
    mesh = make_mesh()
    assert mesh.size >= 8
    sharded = shard_batch(pad_batch_to_devices(batch, mesh.size), mesh)
    state = task.build_state(jax.random.PRNGKey(0))
    state, metrics = jax.jit(task.train_step)(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(metrics["total_loss"])))
