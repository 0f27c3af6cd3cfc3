"""Round-4 trainer hardening tests (VERDICT r3 next-round #4/#8).

Covers the best-checkpoint monitor fallback (must not mix non-loss
diagnostics into the monitored total; reference picks an explicit
`total_loss`, tasks/base_task.py:289), the async checkpoint writer
(ordered, joined at fit() exit, kill-safe via the .part+replace protocol
in utils/checkpoint.py), and the artifact-logging interval gate.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest

from dicttts_tpu.train.trainer import Trainer


class _FakeEvalTask:
    def __init__(self, batches):
        self._batches = batches

    def val_batches(self):
        return iter(
            [{"mels": np.asarray(b, np.float32)[:, None, None]} for b in self._batches]
        )


def _run_eval(tmp_path, metrics_fn, monitor_key="total_loss"):
    tr = Trainer(work_dir=str(tmp_path), mesh=None, monitor_key=monitor_key)

    def val_step(state, batch, rng):
        return metrics_fn(batch)

    return tr._evaluate(
        _FakeEvalTask([np.arange(1, 5, dtype=np.float32)]),
        {},
        val_step,
        jax.random.PRNGKey(0),
    )


def test_monitor_fallback_excludes_diagnostics(tmp_path):
    """When monitor_key is absent, only loss-named metrics may enter the
    best-checkpoint total — a large non-loss diagnostic (e.g. an attention
    focus percentage) must not drown the decision (VERDICT r3 #8)."""
    import jax.numpy as jnp

    means = _run_eval(
        tmp_path,
        lambda b: {
            "l1_loss": jnp.float32(0.5),
            "kl": jnp.float32(0.1),
            "attn_focus_pct": jnp.float32(97.0),  # diagnostic, NOT a loss
        },
    )
    assert means["total_loss"] == pytest.approx(0.6, abs=1e-6)


def test_monitor_key_present_wins(tmp_path):
    import jax.numpy as jnp

    means = _run_eval(
        tmp_path,
        lambda b: {"total_loss": jnp.float32(2.5), "weird_metric": jnp.float32(99.0)},
    )
    assert means["total_loss"] == pytest.approx(2.5, abs=1e-6)


def test_monitor_fallback_last_resort_sums_all(tmp_path):
    """A task reporting nothing loss-like still gets a finite monitor."""
    import jax.numpy as jnp

    means = _run_eval(tmp_path, lambda b: {"per": jnp.float32(3.0)})
    assert means["total_loss"] == pytest.approx(3.0, abs=1e-6)


def test_async_save_ordered_and_joined(tmp_path):
    """_save returns before the file hits disk (worker thread), but writes
    stay ordered and _join_pending_save flushes the last one — fit() calls
    it before returning so no checkpoint is lost at exit."""
    tr = Trainer(work_dir=str(tmp_path), mesh=None, num_ckpt_keep=10)
    state = {"params": {"w": np.ones((4,), np.float32)}}
    for step in (1, 2, 3):
        tr.global_step = step
        tr._save(state, {"total_loss": 1.0 / step})
    tr._join_pending_save()
    ckpts = sorted(os.listdir(str(tmp_path)))
    names = [c for c in ckpts if c.startswith("model_ckpt_steps_")]
    assert names == [f"model_ckpt_steps_{s}.ckpt" for s in (1, 2, 3)]
    # best tracking survived the thread handoff: step 3 had the lowest loss
    assert tr.best_val == pytest.approx(1.0 / 3)


def test_async_save_rotation(tmp_path):
    tr = Trainer(work_dir=str(tmp_path), mesh=None, num_ckpt_keep=2, save_best=False)
    state = {"params": {"w": np.zeros((2,), np.float32)}}
    for step in range(1, 6):
        tr.global_step = step
        tr._save(state, {"total_loss": float(step)})
    tr._join_pending_save()
    names = sorted(
        c for c in os.listdir(str(tmp_path)) if c.startswith("model_ckpt_steps_")
    )
    assert names == ["model_ckpt_steps_4.ckpt", "model_ckpt_steps_5.ckpt"]


def test_save_snapshot_survives_donation(tmp_path):
    """_save must capture the state's values at call time even though the
    device->host pull happens later on the worker thread: train_step donates
    the live buffers, so the save path snapshots on device first
    (_snapshot_tree). The written checkpoint must hold the PRE-overwrite
    values bit-exactly (incl. -0.0)."""
    import jax.numpy as jnp

    from dicttts_tpu.utils.checkpoint import restore_checkpoint

    tr = Trainer(work_dir=str(tmp_path), mesh=None)
    w0 = np.asarray([-0.0, 1.5, -2.25, 3.0], np.float32)
    state = {"params": {"w": jnp.asarray(w0)}}
    tr.global_step = 7
    tr._save(state, {"total_loss": 1.0})
    # simulate the next train dispatch clobbering the live state via donation
    clobber = jax.jit(lambda t: jax.tree.map(lambda v: v * 0 + 9.0, t), donate_argnums=0)
    state = clobber(state)
    jax.block_until_ready(state)
    tr._join_pending_save()
    step, restored = restore_checkpoint(
        os.path.join(str(tmp_path), "model_ckpt_steps_7.ckpt"),
        {"params": {"w": np.zeros(4, np.float32)}},
    )
    assert step == 7
    got = np.asarray(restored["params"]["w"])
    assert (got.view(np.uint32) == w0.view(np.uint32)).all()


def test_valid_infer_interval_defaults_to_val_interval(tmp_path):
    tr = Trainer(work_dir=str(tmp_path), mesh=None, val_check_interval=250)
    assert tr.valid_infer_interval == 250
    tr2 = Trainer(
        work_dir=str(tmp_path),
        mesh=None,
        val_check_interval=250,
        valid_infer_interval=1000,
    )
    assert tr2.valid_infer_interval == 1000
