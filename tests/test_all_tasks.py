"""Train-step smokes for every task family (fs2 / ps_adv / ps_flow /
hifigan) on tiny dims — one jitted step each, finite losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicttts_tpu.train.tasks.fs2 import FastSpeech2Task
from dicttts_tpu.train.tasks.hifigan import HifiGanTask
from dicttts_tpu.train.tasks.ps_adv import PortaSpeechAdvTask
from dicttts_tpu.train.tasks.ps_flow import PortaSpeechFlowTask


def _fs2_batch(B=2, Tt=6, Tm=16):
    rng = np.random.RandomState(0)
    mel2ph = np.zeros((B, Tm), np.int64)
    for b in range(B):
        mel2ph[b, :12] = np.repeat(np.arange(1, 5), 3)
    return {
        "txt_tokens": rng.randint(3, 20, (B, Tt)).astype(np.int64),
        "mel2ph": mel2ph,
        "mels": rng.randn(B, Tm, 80).astype(np.float32) * (mel2ph > 0)[:, :, None],
        "f0": rng.randn(B, Tm).astype(np.float32),
        "uv": (rng.rand(B, Tm) > 0.7).astype(np.float32),
    }


FS2_CFG = {
    "n_vocab": 20, "hidden_size": 16, "enc_layers": 1, "dec_layers": 1,
    "num_heads": 2, "dropout": 0.0, "predictor_dropout": 0.0,
    "dur_predictor_layers": 2, "warmup_updates": 10, "max_frames": 32,
}


def test_fs2_task_step_and_infer():
    task = FastSpeech2Task(FS2_CFG)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = _fs2_batch()
    state, m = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(m)
    assert np.isfinite(m["total_loss"]) and "pdur" in m and "uv" in m and "f0" in m
    out = jax.device_get(jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(2)))
    assert out["mel_out"].shape == (2, 32, 80)


def _ps_batch(B=2, Tph=8, W=4, Tm=16):
    rng = np.random.RandomState(1)
    ph2word = np.tile(np.repeat(np.arange(1, W + 1), Tph // W), (B, 1)).astype(np.int64)
    mel2word = np.zeros((B, Tm), np.int64)
    mel2word[:, :12] = np.repeat(np.arange(1, W + 1), 3)
    return {
        "txt_tokens": rng.randint(3, 20, (B, Tph)).astype(np.int64),
        "ph2word": ph2word,
        "word_tokens": rng.randint(3, 20, (B, W)).astype(np.int64),
        "mel2word": mel2word,
        "mels": rng.randn(B, Tm, 80).astype(np.float32) * (mel2word > 0)[:, :, None],
        "word_lengths": np.full(B, W, np.int32),
        "mel_lengths": np.full(B, 12, np.int32),
    }


PS_CFG = {
    "n_vocab": 20, "hidden_size": 16, "num_heads": 2, "enc_layers": 1,
    "word_enc_layers": 1, "enc_ffn_kernel_size": 3, "dropout": 0.0,
    "predictor_dropout": 0.0, "dur_predictor_layers": 2, "latent_size": 4,
    "fvae_enc_dec_hidden": 16, "fvae_enc_n_layers": 1, "fvae_dec_n_layers": 1,
    "prior_glow_hidden": 8, "prior_glow_n_blocks": 1, "mel_disc_hidden_size": 8,
    "disc_win_num": 1, "warmup_updates": 10, "mel_loss": "l1:1.0",
    "max_frames": 32, "frames_multiple": 4,
}


def test_ps_adv_task_step():
    task = PortaSpeechAdvTask(PS_CFG)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = _ps_batch()
    state, m = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(m)
    assert np.isfinite(m["total_loss"]) and "kl" in m and "wdur" in m


def test_ps_flow_task_disables_adv():
    task = PortaSpeechFlowTask(PS_CFG)
    assert task.lambda_adv == 0.0
    state = task.build_state(jax.random.PRNGKey(0))
    batch = _ps_batch()
    state, m = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    assert "a" not in jax.device_get(m)


HIFI_CFG = {
    "upsample_rates": (4, 4, 2, 2), "upsample_kernel_sizes": (8, 8, 4, 4),
    "upsample_initial_channel": 32, "resblock_kernel_sizes": (3,),
    "resblock_dilation_sizes": ((1, 3, 5),), "max_samples": 1024,
    "hop_size": 64, "fft_size": 256, "win_size": 256, "fmin": 0, "fmax": 8000,
    "disc_start_steps": 0,
}


def test_hifigan_task_step():
    task = HifiGanTask(HIFI_CFG)
    state = task.build_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    batch = {
        "wavs": rng.randn(2, 1024).astype(np.float32) * 0.1,
        "mels": rng.randn(2, 16, 80).astype(np.float32),
    }
    state, m = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(m)
    assert np.isfinite(m["total_loss"]) and np.isfinite(m["disc_loss"])
    assert m["mel"] > 0 and m["a"] >= 0
    out = jax.device_get(jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(2)))
    assert out["wav_out"].shape == (2, 1024)
