"""Two-stage post-glow training in PortaSpeechFlowTask: stage gating,
partition freezing, and the post-glow inference path."""

import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.train.tasks.ps_flow import PortaSpeechFlowTask
from tests.test_all_tasks import PS_CFG, _ps_batch

PG_CFG = {
    **PS_CFG,
    "use_post_glow": True,
    "post_glow_training_start": 2,
    "post_glow_hidden": 8,
    "post_glow_n_blocks": 2,
    "post_glow_n_block_layers": 1,
    "share_wn_layers": 2,
}


def _flat(tree):
    return {jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(tree)}


def _split(flat):
    pf = {k: v for k, v in flat.items() if "post_flow" in k}
    main = {k: v for k, v in flat.items() if "post_flow" not in k}
    return main, pf


def test_two_stage_gating():
    task = PortaSpeechFlowTask(PG_CFG)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = _ps_batch()
    step = jax.jit(task.train_step)

    p0_main, p0_pf = _split(_flat(state["params_g"]))
    assert p0_pf, "post-glow params must exist"

    # stage 1 (steps 0,1): main trains, postflow frozen
    state, m = step(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(m)
    assert np.isfinite(m["total_loss"]) and "postflow" in m and m["post_stage"] == 0
    p1_main, p1_pf = _split(_flat(state["params_g"]))
    assert any(np.abs(p1_main[k] - p0_main[k]).max() > 0 for k in p0_main)
    assert all(np.array_equal(p1_pf[k], p0_pf[k]) for k in p0_pf)

    # advance into stage 2 (step >= 2): postflow trains, main frozen
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    p2_main, p2_pf = _split(_flat(state["params_g"]))
    state, m = step(state, batch, jax.random.PRNGKey(3))
    m = jax.device_get(m)
    assert m["post_stage"] == 1
    p3_main, p3_pf = _split(_flat(state["params_g"]))
    assert all(np.array_equal(p3_main[k], p2_main[k]) for k in p2_main)
    assert any(np.abs(p3_pf[k] - p2_pf[k]).max() > 0 for k in p2_pf)


def test_postflow_loss_decreases():
    """The postflow NLL must actually train in stage 2."""
    cfg = {**PG_CFG, "post_glow_training_start": 0, "lr": 0.5}
    task = PortaSpeechFlowTask(cfg)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = _ps_batch()
    step = jax.jit(task.train_step)
    first = None
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(10 + i))
        if first is None:
            first = float(m["postflow"])
    assert float(m["postflow"]) < first


def test_infer_uses_post_glow():
    task = PortaSpeechFlowTask(PG_CFG)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = _ps_batch()
    out = jax.device_get(jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(1)))
    assert out["mel_out"].shape == (2, 32, 80)
    assert np.all(np.isfinite(out["mel_out"]))
    # different sample keys -> different post-glow noise -> different mels
    out2 = jax.device_get(jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(2)))
    assert np.abs(out["mel_out"] - out2["mel_out"]).max() > 1e-6


def test_val_step_reports_both_losses():
    task = PortaSpeechFlowTask(PG_CFG)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = _ps_batch()
    losses = jax.device_get(jax.jit(task.val_step)(state, batch, jax.random.PRNGKey(1)))
    assert "postflow" in losses and "kl" in losses
    assert np.isfinite(losses["total_loss"])
