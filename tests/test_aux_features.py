"""Auxiliary feature coverage: CWT f0, RefEncoder, EnergyPredictor,
pre-align wav ops (the remaining SURVEY §2.4/§2.6 partial rows)."""

import numpy as np

from dicttts_tpu.ops.cwt import (
    convert_continuous_f0,
    cwt_mexican_hat,
    f0_cwt,
    inverse_cwt,
)


def _toy_f0(T=200):
    t = np.arange(T)
    f0 = 180 + 40 * np.sin(2 * np.pi * t / 60)
    f0[:12] = 0  # unvoiced head
    f0[90:110] = 0  # unvoiced gap
    f0[-8:] = 0
    return f0.astype(np.float32)


def test_continuous_f0_interpolation():
    f0 = _toy_f0()
    uv, cont = convert_continuous_f0(f0)
    assert uv.shape == f0.shape
    assert (cont > 0).all()
    nz = f0 > 0
    np.testing.assert_allclose(cont[nz], f0[nz])


def test_cwt_shapes_and_recomposition():
    f0 = _toy_f0()
    feats = f0_cwt(f0)
    assert feats["cwt_spec"].shape == (len(f0), 10)
    assert feats["cwt_mean"].shape == (10,)
    # approximate recomposition correlates strongly with the normalized lf0
    from dicttts_tpu.ops.cwt import get_cont_lf0

    _, lf0 = get_cont_lf0(f0)
    lf0n = (lf0 - lf0.mean()) / lf0.std()
    rec = inverse_cwt(feats["cwt_spec"])
    corr = np.corrcoef(rec, lf0n)[0, 1]
    assert corr > 0.85, corr


def test_cwt_all_unvoiced_safe():
    feats = f0_cwt(np.zeros(64, np.float32))
    assert np.isfinite(feats["cwt_spec"]).all()


def test_ref_encoder_shapes():
    import jax

    from dicttts_tpu.models.fastspeech2 import RefEncoder

    m = RefEncoder(out_channels=32, hidden_stride_kernel=("16,2,5", "0,2,5"))
    mel = np.random.RandomState(0).randn(2, 40, 80).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), mel)["params"]
    out = m.apply({"params": params}, mel)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_fs2_energy_path():
    import jax
    import jax.numpy as jnp

    from dicttts_tpu.models.fastspeech2 import FastSpeech2, energy_to_coarse, mel_energy

    m = FastSpeech2(
        n_vocab=20, hidden_size=16, enc_layers=1, dec_layers=1, num_heads=2,
        use_pitch_embed=False, use_energy_embed=True, use_ref_enc=True,
        predictor_hidden=16, dur_predictor_layers=2,
    )
    B, Tt, Tm = 2, 6, 24
    tokens = jnp.asarray(np.random.RandomState(0).randint(1, 20, (B, Tt)), jnp.int32)
    mel2ph = jnp.asarray(np.repeat(np.arange(1, Tt + 1), Tm // Tt)[None].repeat(B, 0), jnp.int32)
    mels = jnp.asarray(np.random.RandomState(1).randn(B, Tm, 80), jnp.float32)
    energy = mel_energy(mels)
    params = m.init(
        jax.random.PRNGKey(0), tokens, mel2ph, energy=energy, ref_mels=mels
    )["params"]
    assert "energy_predictor" in params and "ref_encoder" in params
    out = m.apply({"params": params}, tokens, mel2ph, energy=energy, ref_mels=mels)
    assert out["mel_out"].shape == (B, Tm, 80)
    assert out["energy_pred"].shape == (B, Tm)
    # coarse ids stay in the embedding table and 0 only on pad
    ids = np.asarray(energy_to_coarse(energy))
    assert ids.min() >= 0 and ids.max() < 256


def test_prealign_wav_ops(tmp_path):
    import json

    from dicttts_tpu.text.binarizer import PreAlign
    from dicttts_tpu.vocoders.hifigan import load_wav, save_wav

    sr = 22050
    t = np.arange(int(sr * 1.0)) / sr
    sig = 0.3 * np.sin(2 * np.pi * 220 * t)
    wav = np.concatenate([np.zeros(sr // 4), sig, np.zeros(sr // 4)]).astype(np.float32)
    src = tmp_path / "x.wav"
    save_wav(str(src), wav)
    json.dump({"你": {"nǐ": ["x"]}}, open(tmp_path / "d.json", "w"))

    class P(PreAlign):
        def meta_data(self):
            yield "x", str(src), "你"

    cfg = {
        "processed_data_dir": str(tmp_path / "proc"),
        "dict_path": str(tmp_path / "d.json"),
        "pre_align_args": {"trim_sil": True, "denoise": True},
        "audio_sample_rate": sr,
    }
    p = P(cfg)
    new_fn = p.process_wav("x", str(src))
    assert new_fn != str(src)
    trimmed, _ = load_wav(new_fn)
    # leading/trailing silence dropped: much shorter than the padded input
    assert len(trimmed) < len(wav) - sr // 4
    assert np.abs(trimmed).max() > 0.1


def test_ctm_to_textgrid_roundtrip(tmp_path):
    import subprocess
    import sys as _sys

    from dicttts_tpu.text.textgrid import parse_textgrid

    ctm = tmp_path / "phone.ctm"
    ctm.write_text(
        "utt1 1 0.00 0.10 n\nutt1 1 0.10 0.22 i3\nutt1 1 0.40 0.15 h\n"
        "utt1 1 0.55 0.20 ao3\nutt2 1 0.00 0.30 t\n"
    )
    out = tmp_path / "tg"
    subprocess.check_call(
        [_sys.executable, "scripts/ctm_to_textgrid.py", "--phone_ctm", str(ctm), "--out", str(out)]
    )
    ivs = parse_textgrid((out / "utt1.TextGrid").read_text())
    labels = [l for _, _, l in ivs]
    assert labels == ["n", "i3", "", "h", "ao3"]
    assert abs(ivs[-1][1] - 0.75) < 1e-6
