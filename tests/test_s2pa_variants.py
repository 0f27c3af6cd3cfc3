"""Sense-grouped / Gumbel S2PA variants + JCU discriminator."""

import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.models.dict_encoder import (
    S2PAAttention,
    DictMsg,
    gumbel_softmax,
    sense_remap,
    sense_remap_grouped,
)
from dicttts_tpu.models.discriminator import JCUDiscriminator


def _toy_maps():
    # one word, 2 senses: gloss tokens [1,1,2,2,0], pinyin [1,1,2,2]
    key_map = jnp.asarray([[[1, 1, 2, 2, 0]]], jnp.int32)
    pinyin_map = jnp.asarray([[[1, 1, 2, 2]]], jnp.int32)
    weights = jnp.asarray([[[0.5, 0.2, 0.2, 0.1, 0.0]]], jnp.float32)
    return weights, key_map, pinyin_map


def test_sense_mode_softmax_broadcasts_per_sense():
    weights, key_map, pinyin_map = _toy_maps()
    out = sense_remap_grouped(weights, key_map, pinyin_map, max_senses=4, mode="sense")
    # merged masses: sense1=0.7, sense2=0.3 -> softmax([0.7, 0.3]) broadcast
    exp = jax.nn.softmax(jnp.asarray([0.7, 0.3]))
    np.testing.assert_allclose(np.asarray(out[0, 0, :2]), np.full(2, float(exp[0])), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 0, 2:]), np.full(2, float(exp[1])), rtol=1e-6)


def test_gumbel_mode_is_hard_one_hot_per_sense():
    weights, key_map, pinyin_map = _toy_maps()
    out = sense_remap_grouped(
        weights, key_map, pinyin_map, max_senses=4, mode="gumbel", rng=None
    )  # deterministic: ST argmax -> sense 1 wins (0.7 > 0.3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [1, 1, 0, 0], atol=1e-6)


def test_gumbel_softmax_straight_through_grad():
    logits = jnp.asarray([0.2, 0.5, 0.3])

    def f(l):
        return jnp.sum(gumbel_softmax(l, 0.8, hard=True, rng=None) * jnp.arange(3.0))

    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g))) and np.abs(np.asarray(g)).sum() > 0


def test_empty_sense_rows_get_zero_mass():
    weights, key_map, pinyin_map = _toy_maps()
    key_map = key_map.at[0, 0].set(0)  # pad word: no gloss tokens
    out = sense_remap_grouped(weights, key_map, pinyin_map, max_senses=4, mode="sense")
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def _attn_inputs(rng):
    B, T, Lk, Lp, E = 2, 3, 5, 4, 16
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, T, 8).astype(np.float32))
    dm = DictMsg(
        jnp.asarray(r.randn(B, T, Lk, E).astype(np.float32)),
        jnp.asarray(r.randn(B, T, Lk, E).astype(np.float32)),
        jnp.tile(jnp.asarray([1, 1, 2, 2, 0], jnp.int32), (B, T, 1)),
        jnp.asarray(r.randint(1, 20, (B, T, Lp)).astype(np.int32)),
        jnp.tile(jnp.asarray([1, 1, 2, 2], jnp.int32), (B, T, 1)),
    )
    return x, dm


def test_s2pa_attention_gumbel_train_mode_runs():
    x, dm = _attn_inputs(0)
    mod = S2PAAttention(8, key_size=16, pinyin_vocab=20, sense_mode="gumbel")
    params = mod.init({"params": jax.random.PRNGKey(0)}, x, dm)
    ctx, align, pron, pw = mod.apply(
        params, x, dm, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    # hard ST: each word's pron weights are one-hot over ONE sense's tokens
    pw = np.asarray(pw)
    assert set(np.round(pw.flatten(), 5)).issubset({0.0, 1.0})
    assert np.all(pw.sum(-1) == 2)  # 2 pinyin tokens per selected sense
    assert np.all(np.isfinite(np.asarray(ctx)))


def test_s2pa_attention_token_mode_unchanged():
    x, dm = _attn_inputs(0)
    mod = S2PAAttention(8, key_size=16, pinyin_vocab=20)
    params = mod.init({"params": jax.random.PRNGKey(0)}, x, dm)
    _, align, _, pw = mod.apply(params, x, dm, deterministic=True)
    exp = sense_remap(align, dm.key_map, dm.pinyin_map)
    np.testing.assert_allclose(np.asarray(pw), np.asarray(exp), rtol=1e-5)


def test_jcu_discriminator_shapes_and_grads():
    B, T = 2, 32
    r = np.random.RandomState(0)
    mel = jnp.asarray(r.randn(B, T, 80).astype(np.float32))
    cond = jnp.asarray(r.randn(B, T, 192).astype(np.float32))
    disc = JCUDiscriminator()
    params = disc.init(jax.random.PRNGKey(0), mel, cond)
    out = disc.apply(params, mel, cond)
    assert out["y"].shape == (B, T // 2, 1)  # stride-2 front end
    assert out["y_c"].shape == (B, T // 2, 1)

    def loss(p):
        o = disc.apply(p, mel, cond)
        return jnp.mean(o["y"] ** 2) + jnp.mean(o["y_c"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)
