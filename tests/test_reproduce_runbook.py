"""End-to-end smoke of scripts/reproduce_biaobei.sh on a miniature
Biaobei-layout synthetic corpus (VERDICT r2 #10): prealign -> binarize ->
train (few steps) -> infer -> PER scoring all chain from ONE command."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mini_biaobei(root):
    """Biaobei directory layout: ProsodyLabeling/000001-010000.txt + Wave/."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from synth_corpus import gen_dictionary

    from dicttts_tpu.vocoders.hifigan import save_wav

    d = gen_dictionary(30, seed=7)
    chars = list(d)
    dict_fn = os.path.join(root, "zh-dict.json")
    json.dump(d, open(dict_fn, "w"), ensure_ascii=False)
    raw = os.path.join(root, "raw")
    os.makedirs(os.path.join(raw, "ProsodyLabeling"), exist_ok=True)
    os.makedirs(os.path.join(raw, "Wave"), exist_ok=True)
    rng = np.random.RandomState(7)
    lines = []
    for i in range(8):
        name = f"{i + 1:06d}"
        text = "".join(rng.choice(chars, 6)) + "#1" + "".join(rng.choice(chars, 4))
        lines.append(f"{name}\t{text}\n")
        lines.append("\tpinyin-line-unused\n")
        t = np.arange(int(22050 * 1.4)) / 22050
        wav = (0.3 * np.sin(2 * np.pi * (150 + 20 * i) * t)).astype(np.float32)
        save_wav(os.path.join(raw, "Wave", f"{name}.wav"), wav)
    open(os.path.join(raw, "ProsodyLabeling", "000001-010000.txt"), "w").writelines(lines)
    return raw, dict_fn


@pytest.mark.slow
def test_runbook_end_to_end(tmp_path):
    root = str(tmp_path)
    raw, dict_fn = _mini_biaobei(root)
    env = {
        **os.environ,
        "DICTTTS_PLATFORM": "cpu",
        # miniature dims so the CPU train/infer finishes in seconds
        "HP": ",".join([
            f"dict_path={dict_fn}",
            f"processed_data_dir={root}/processed",
            f"binary_data_dir={root}/binary",
            "test_num=2", "valid_num=2",
            "word_size=40",
            "hidden_size=16", "fvae_enc_dec_hidden=16", "latent_size=4",
            "fvae_enc_n_layers=1", "fvae_dec_n_layers=1",
            "prior_glow_hidden=8", "prior_glow_n_blocks=1",
            "mel_disc_hidden_size=8",
            "max_updates=4", "val_check_interval=4", "num_sanity_val_steps=0",
            "steps_per_dispatch=1", "max_sentences=4", "max_frames=128",
            "mel_buckets=[128]", "txt_buckets=[16]",
            "use_pallas_s2pa=False", "use_device_dict_bank=False",
            "vocoder_ckpt=", "lm_model=", "dict_embed_dim=16",
            "num_ckpt_keep=1", "eval_max_batches=1",
        ]),
        "LABELS": os.path.join(root, "no_labels.csv"),  # skip PER-anchor step
    }
    exp = "runbook_smoke"
    import shutil

    shutil.rmtree(os.path.join(REPO, "checkpoints", exp), ignore_errors=True)
    res = subprocess.run(
        ["bash", "scripts/reproduce_biaobei.sh", raw, exp],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout[-4000:]}\nstderr:\n{res.stderr[-4000:]}"
    out_dir = os.path.join(REPO, "checkpoints", exp)
    meta = os.path.join(out_dir, "generated", "meta.csv")
    assert os.path.exists(meta), res.stdout[-2000:]
    # the runbook produced scoreable predictions + audio artifacts
    import csv

    rows = list(csv.reader(open(meta)))
    assert len(rows) >= 2
    # without a vocoder checkpoint the infer step writes predicted mels
    # (with one, it writes wavs too — covered by the TPU CLI drives)
    mels = [f for f in os.listdir(os.path.join(out_dir, "generated")) if f.endswith(".mel.npy")]
    assert mels, "no generated mel artifacts"
    m = np.load(os.path.join(out_dir, "generated", mels[0]))
    assert m.ndim == 2 and m.shape[1] == 80 and np.isfinite(m).all()
    shutil.rmtree(out_dir, ignore_errors=True)
