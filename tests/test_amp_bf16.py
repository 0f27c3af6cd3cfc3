"""True-amp (bf16 activations) regression: under `amp` the tasks trace the
model with compute_dtype(bf16) (ops/amp.py) — parameters, optimizer state,
losses, KL/flow islands, and softmax statistics stay f32. These tests pin:

  * dtype contract: mel_out/losses f32, params f32, finite steps;
  * proximity: a bf16-activation train step's losses agree with the pure-f32
    step to a few percent (same rng, same batch);
  * the amp-off path is byte-for-byte the pre-amp graph (cdtype() is None
    -> every flax layer keeps its default dtype), which the whole-model
    torch-parity suite (tests/test_model_parity.py) also guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicttts_tpu.data.providers import SyntheticDictTTSProvider
from dicttts_tpu.train.tasks.dict_tts import DictTTSTask

CFG = dict(
    word_size=20, dict_embed_dim=16, value_embedding_size=20,
    hidden_size=16, num_heads=2, enc_ffn_kernel_size=3, dropout=0.0,
    latent_size=4, fvae_enc_dec_hidden=16, fvae_enc_n_layers=1, fvae_dec_n_layers=1,
    prior_glow_hidden=8, prior_glow_n_blocks=1, mel_disc_hidden_size=8,
    disc_win_num=1, warmup_updates=10, mel_loss="ssim:0.5|l1:0.5",
    dur_predictor_layers=2, max_frames=48, frames_multiple=4,
    disc_start_steps=0, use_pitch_embed=False,
)


def _task(amp: bool):
    data = SyntheticDictTTSProvider(
        n_items=4, batch_size=4, word_vocab=20, embed_dim=16,
        t_words=6, l_gloss=5, l_pinyin=4, pinyin_vocab=20, max_frames=48,
    )
    cfg = dict(CFG, amp=amp)
    return DictTTSTask(cfg, data)


def _step(task, seed=0):
    state = task.build_state(jax.random.PRNGKey(seed))
    batch = next(iter(task.train_batches()))
    state2, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(3))
    return state, state2, jax.device_get(metrics)


def test_bf16_step_finite_and_f32_contract():
    task = _task(amp=True)
    assert task.act_dtype == jnp.bfloat16
    state, state2, metrics = _step(task)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
        assert np.asarray(v).dtype == np.float32, (k, np.asarray(v).dtype)
    # params and optimizer state stay f32 through the bf16 step
    for leaf in jax.tree.leaves(state2["params_g"]):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state2["opt_g"]):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_bf16_losses_close_to_f32():
    t32, t16 = _task(amp=False), _task(amp=True)
    _, _, m32 = _step(t32)
    _, _, m16 = _step(t16)
    assert set(m32) == set(m16)
    for k in m32:
        a, b = float(m32[k]), float(m16[k])
        # bf16 has ~3 decimal digits; losses are O(0.1-5) sums over many
        # elements, so a few percent is the expected drift
        assert abs(a - b) <= 0.05 * max(1.0, abs(a)), (k, a, b)


def test_infer_path_bf16_outputs_f32():
    task = _task(amp=True)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = next(iter(task.train_batches()))
    out = jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(1))
    out = jax.device_get(out)
    assert out["mel_out"].dtype == np.float32
    assert np.isfinite(out["mel_out"]).all()


HIFI_CFG = {
    "upsample_rates": (4, 4, 2, 2), "upsample_kernel_sizes": (8, 8, 4, 4),
    "upsample_initial_channel": 32, "resblock_kernel_sizes": (3,),
    "resblock_dilation_sizes": ((1, 3, 5),), "max_samples": 1024,
    "hop_size": 64, "fft_size": 256, "win_size": 256, "fmin": 0, "fmax": 8000,
    "disc_start_steps": 0,
}


def _hifi_step(amp: bool):
    from dicttts_tpu.train.tasks.hifigan import HifiGanTask

    task = HifiGanTask(dict(HIFI_CFG, amp=amp))
    state = task.build_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    batch = {
        "wavs": rng.randn(2, 1024).astype(np.float32) * 0.1,
        "mels": rng.randn(2, 16, 80).astype(np.float32),
    }
    state2, m = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    return task, state2, jax.device_get(m)


def test_hifigan_bf16_step_finite_and_f32_contract():
    task, state2, m = _hifi_step(amp=True)
    assert task.act_dtype == jnp.bfloat16
    for k, v in m.items():
        assert np.isfinite(v), (k, v)
        assert np.asarray(v).dtype == np.float32, (k, np.asarray(v).dtype)
    for leaf in jax.tree.leaves((state2["params_g"], state2["params_d"])):
        assert leaf.dtype == jnp.float32


def test_hifigan_bf16_losses_close_to_f32():
    _, _, m32 = _hifi_step(amp=False)
    _, _, m16 = _hifi_step(amp=True)
    assert set(m32) == set(m16)
    for k in m32:
        a, b = float(m32[k]), float(m16[k])
        assert abs(a - b) <= 0.06 * max(1.0, abs(a)), (k, a, b)


def _fs2_step(amp: bool):
    from dicttts_tpu.train.tasks.fs2 import FastSpeech2Task

    cfg = {
        "n_vocab": 20, "hidden_size": 16, "enc_layers": 1, "dec_layers": 1,
        "num_heads": 2, "dropout": 0.0, "predictor_dropout": 0.0,
        "dur_predictor_layers": 2, "warmup_updates": 10, "max_frames": 32,
        "amp": amp,
    }
    task = FastSpeech2Task(cfg)
    state = task.build_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B, Tt, Tm = 2, 6, 16
    mel2ph = np.zeros((B, Tm), np.int64)
    for b in range(B):
        mel2ph[b, :12] = np.repeat(np.arange(1, 5), 3)
    batch = {
        "txt_tokens": rng.randint(3, 20, (B, Tt)).astype(np.int64),
        "mel2ph": mel2ph,
        "mels": rng.randn(B, Tm, 80).astype(np.float32) * (mel2ph > 0)[:, :, None],
        "f0": rng.randn(B, Tm).astype(np.float32),
        "uv": (rng.rand(B, Tm) > 0.7).astype(np.float32),
    }
    state2, m = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    return task, state2, jax.device_get(m)


def test_fs2_bf16_step_finite_and_close_to_f32():
    t16, s16, m16 = _fs2_step(amp=True)
    assert t16.act_dtype == jnp.bfloat16
    _, _, m32 = _fs2_step(amp=False)
    assert set(m32) == set(m16)
    for k in m32:
        a, b = float(m32[k]), float(m16[k])
        assert np.isfinite(b), (k, b)
        assert abs(a - b) <= 0.06 * max(1.0, abs(a)), (k, a, b)
    for leaf in jax.tree.leaves(s16["params_g"]):
        assert leaf.dtype == jnp.float32


def test_amp_off_has_no_bf16_anywhere():
    """With amp off the traced graph must stay pure f32 (parity mode)."""
    task = _task(amp=False)
    assert task.act_dtype is None
    state = task.build_state(jax.random.PRNGKey(0))
    batch = next(iter(task.train_batches()))
    lowered = jax.jit(task.train_step).lower(state, batch, jax.random.PRNGKey(3))
    assert "bf16" not in lowered.as_text()
