"""Trainer multi-step grouping edge cases, driven with a stub task: mixed
batch shapes must not skip periodic validation/checkpointing (regression
for the bug found driving the CLI on an alternating-shape corpus)."""

import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.parallel.mesh import make_mesh
from dicttts_tpu.train.trainer import Trainer
from dicttts_tpu.utils.checkpoint import get_all_ckpts


class StubTask:
    """Minimal task: params = scalar, loss = mean(batch.x); batches
    alternate between two shapes each 'epoch'."""

    def __init__(self, shapes=((4, 8), (4, 16))):
        self.shapes = shapes
        self.val_calls = 0

    def build_state(self, rng):
        return {"w": jnp.zeros(()), "step": jnp.zeros((), jnp.int32)}

    def train_step(self, state, batch, rng):
        loss = jnp.mean(batch["x"]) + state["w"] * 0
        return {"w": state["w"] + 1.0, "step": state["step"] + 1}, {"total_loss": loss}

    def val_step(self, state, batch, rng):
        return {"total_loss": jnp.mean(batch["x"])}

    def train_batches(self):
        for i, shape in enumerate(self.shapes):
            yield {"x": np.full(shape, float(i), np.float32)}

    def val_batches(self):
        yield {"x": np.ones((4, 8), np.float32)}


def test_mixed_shapes_still_validate_and_checkpoint(tmp_path):
    task = StubTask()
    trainer = Trainer(
        work_dir=str(tmp_path / "exp"),
        max_updates=8,
        val_check_interval=4,
        num_sanity_val_steps=0,
        tb_log_interval=2,
        mesh=make_mesh(1),
        steps_per_dispatch=4,
    )
    state = trainer.fit(task)
    assert int(jax.device_get(state["step"])) == 8
    steps = sorted(int(p.split("_")[-1].split(".")[0]) for p in get_all_ckpts(str(tmp_path / "exp")))
    # BOTH interval checkpoints exist despite every flush being odd-shaped
    assert 4 in steps and 8 in steps, steps


def test_group_crossing_interval_still_validates(tmp_path):
    # same-shape batches, groups of 3 jump over the interval mark 4
    task = StubTask(shapes=((4, 8), (4, 8), (4, 8)))
    trainer = Trainer(
        work_dir=str(tmp_path / "exp2"),
        max_updates=9,
        val_check_interval=4,
        num_sanity_val_steps=0,
        mesh=make_mesh(1),
        steps_per_dispatch=3,
    )
    trainer.fit(task)
    steps = sorted(int(p.split("_")[-1].split(".")[0]) for p in get_all_ckpts(str(tmp_path / "exp2")))
    # the step-6 group crossed the 4-mark; a checkpoint must still exist <= 6
    assert any(s <= 6 for s in steps) and 9 in steps, steps


def test_steady_state_throughput_recorded(tmp_path):
    """steady_per_step_s must be set after >=2 dispatches (the first
    dispatch absorbs compile and restarts the clock) and be a sane
    positive per-step wall time."""
    task = StubTask(shapes=((4, 8), (4, 8)))
    trainer = Trainer(
        work_dir=str(tmp_path / "exp3"),
        max_updates=8,
        val_check_interval=100,
        num_sanity_val_steps=0,
        mesh=make_mesh(1),
        steps_per_dispatch=2,
    )
    trainer.fit(task)
    assert trainer.steady_per_step_s is not None
    assert 0 < trainer.steady_per_step_s < 60.0


def test_steady_state_none_for_single_dispatch(tmp_path):
    # one dispatch only: everything is absorbed by the first-dispatch sync
    task = StubTask(shapes=((4, 8), (4, 8)))
    trainer = Trainer(
        work_dir=str(tmp_path / "exp4"),
        max_updates=2,
        val_check_interval=100,
        num_sanity_val_steps=0,
        mesh=make_mesh(1),
        steps_per_dispatch=2,
    )
    trainer.fit(task)
    assert trainer.steady_per_step_s is None


class RngAccTask(StubTask):
    """Loss folds the per-step rng into an accumulator so the trainer's rng
    stream is observable in checkpointed state."""

    def build_state(self, rng):
        return {"acc": jnp.zeros(()), "step": jnp.zeros((), jnp.int32)}

    def train_step(self, state, batch, rng):
        r = jax.random.normal(rng, ())
        return (
            {"acc": state["acc"] + r, "step": state["step"] + 1},
            {"total_loss": jnp.mean(batch["x"]) + 0 * r},
        )


def test_rng_stream_resume_stable(tmp_path):
    """Per-step rngs derive from (base key, global step) inside the jit, so
    a kill+resume continues the EXACT rng sequence of an uninterrupted run:
    the rng accumulator after 2+2 resumed steps equals 4 straight steps.
    Covers both the single-step path (k=1) and the scanned-group path (k=2,
    resuming from a val-interval group boundary)."""
    for k, tag in ((1, "a"), (2, "b")):
        def make(workdir, max_updates):
            return Trainer(
                work_dir=workdir, max_updates=max_updates, val_check_interval=2,
                num_sanity_val_steps=0, mesh=make_mesh(1), seed=7,
                steps_per_dispatch=k,
            )

        shapes = ((4, 8),) * 4
        straight = make(str(tmp_path / f"straight_{tag}"), 4).fit(RngAccTask(shapes))
        resumed_dir = str(tmp_path / f"resumed_{tag}")
        make(resumed_dir, 2).fit(RngAccTask(shapes))
        resumed = make(resumed_dir, 4).fit(RngAccTask(shapes))
        np.testing.assert_array_equal(
            jax.device_get(straight["acc"]), jax.device_get(resumed["acc"])
        )


def test_prefetch_iterator_order_and_errors():
    from dicttts_tpu.utils.prefetch import prefetch_iterator

    assert list(prefetch_iterator(iter(range(100)), depth=4)) == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    try:
        next(it)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "producer failed" in str(e)
