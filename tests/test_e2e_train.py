"""End-to-end: DictTTS GAN training on an 8-device CPU mesh with a synthetic
corpus — the fake-cluster test of the full train loop (SURVEY.md §4)."""

import logging

import jax
import numpy as np
import pytest

from dicttts_tpu.data.providers import SyntheticDictTTSProvider
from dicttts_tpu.parallel.mesh import make_mesh, pad_batch_to_devices, shard_batch
from dicttts_tpu.train.tasks.dict_tts import DictTTSTask
from dicttts_tpu.train.trainer import Trainer
from dicttts_tpu.utils.checkpoint import get_last_checkpoint

TINY_CFG = {
    "word_size": 50,
    "hidden_size": 32,
    "num_heads": 2,
    "enc_ffn_kernel_size": 3,
    "dropout": 0.0,
    "value_embedding_size": 20,
    "dict_embed_dim": 16,
    "latent_size": 4,
    "fvae_enc_dec_hidden": 32,
    "fvae_enc_n_layers": 2,
    "fvae_dec_n_layers": 2,
    "prior_glow_hidden": 8,
    "prior_glow_n_blocks": 2,
    "mel_disc_hidden_size": 16,
    "disc_win_num": 1,  # only the 32-frame window fits the toy mels
    "warmup_updates": 10,
    "lr": 0.1,
    "max_frames": 64,
    "mel_loss": "l1:1.0",
    "dur_predictor_layers": 2,
}


@pytest.fixture(scope="module")
def task_and_data():
    data = SyntheticDictTTSProvider(n_items=16, batch_size=8)
    task = DictTTSTask(TINY_CFG, data)
    return task, data


def test_mesh_has_8_cpu_devices():
    assert jax.device_count() >= 8


def test_shard_batch_partitions_leading_axis(task_and_data):
    _, data = task_and_data
    mesh = make_mesh(8)
    batch = next(iter(data.train_batches()))
    sharded = shard_batch(pad_batch_to_devices(batch, 8), mesh)
    arr = sharded["mels"]
    assert arr.sharding.num_devices == 8


def test_train_loop_runs_and_improves(task_and_data, tmp_path, caplog):
    caplog.set_level(logging.INFO, logger="dicttts_tpu.trainer")
    task, _ = task_and_data
    trainer = Trainer(
        work_dir=str(tmp_path / "exp"),
        max_updates=12,
        val_check_interval=6,
        num_sanity_val_steps=1,
        tb_log_interval=4,
        mesh=make_mesh(8),
        seed=0,
    )
    state = trainer.fit(task)
    assert int(jax.device_get(state["step"])) == 12
    # checkpoint written and resumable
    last = get_last_checkpoint(str(tmp_path / "exp"))
    assert last is not None and last.endswith("12.ckpt")

    # resume continues from saved step
    trainer2 = Trainer(
        work_dir=str(tmp_path / "exp"),
        max_updates=14,
        val_check_interval=100,
        num_sanity_val_steps=0,
        mesh=make_mesh(8),
        seed=0,
    )
    state2 = trainer2.fit(task)
    assert int(jax.device_get(state2["step"])) == 14


def test_val_and_test_steps(task_and_data):
    task, data = task_and_data
    state = task.build_state(jax.random.PRNGKey(0))
    batch = next(iter(data.val_batches()))
    batch = {k: np.asarray(v) for k, v in batch.items()}
    metrics = jax.device_get(jax.jit(task.val_step)(state, batch, jax.random.PRNGKey(1)))
    assert np.isfinite(metrics["total_loss"])
    out = jax.device_get(jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(2)))
    assert out["mel_out"].shape[-1] == 80
    # reference decode window: TWO tokens (initial+final pair) per word
    assert out["pinyin_pred"].shape == batch["word_tokens"].shape + (2,)
    # predicted pinyin ids come from each word's own pinyin candidates
    for b in range(out["pinyin_pred"].shape[0]):
        for t in range(out["pinyin_pred"].shape[1]):
            if batch["word_tokens"][b, t] > 0:
                for i in out["pinyin_pred"][b, t]:
                    assert i in batch["pinyin"][b, t]


def test_train_loop_multi_step_dispatch(task_and_data, tmp_path):
    """steps_per_dispatch > 1: scan-chained steps reach the same step count
    and produce a resumable checkpoint."""
    task, _ = task_and_data
    trainer = Trainer(
        work_dir=str(tmp_path / "exp_k"),
        max_updates=8,
        val_check_interval=4,
        num_sanity_val_steps=0,
        tb_log_interval=2,
        mesh=make_mesh(8),
        seed=0,
        steps_per_dispatch=2,
    )
    state = trainer.fit(task)
    assert int(jax.device_get(state["step"])) == 8
    assert get_last_checkpoint(str(tmp_path / "exp_k")).endswith("8.ckpt")
