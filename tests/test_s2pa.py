"""S2PA math tests against hand-computed fixtures (the reference's
mask_weights_attn / add_pron_rule python-loop semantics, vectorized)."""

import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.models.dict_encoder import (
    DictEncoder,
    DictMsg,
    S2PAAttention,
    apply_pron_rule,
    sense_remap,
)


def test_sense_remap_hand_computed():
    # one batch, one token; 4 gloss tokens over 2 senses; 3 pinyin tokens
    weights = jnp.array([[[0.1, 0.2, 0.3, 0.4]]])
    key_map = jnp.array([[[1, 1, 2, 2]]])  # gloss tokens 0,1 -> sense1; 2,3 -> sense2
    pinyin_map = jnp.array([[[1, 2, 0]]])  # pinyin tok0 -> sense1, tok1 -> sense2, tok2 pad
    out = np.asarray(sense_remap(weights, key_map, pinyin_map))
    np.testing.assert_allclose(out[0, 0], [0.3, 0.7, 0.0], atol=1e-6)


def test_sense_remap_multi_pinyin_per_sense():
    # a sense's mass is broadcast to ALL its pinyin tokens (initial+final)
    weights = jnp.array([[[0.25, 0.75]]])
    key_map = jnp.array([[[1, 2]]])
    pinyin_map = jnp.array([[[1, 1, 2, 2]]])  # two pinyin tokens per sense
    out = np.asarray(sense_remap(weights, key_map, pinyin_map))
    np.testing.assert_allclose(out[0, 0], [0.25, 0.25, 0.75, 0.75], atol=1e-6)


def test_apply_pron_rule_forward_and_gradient():
    pron_w = jnp.array([[[0.3, 0.7, 0.0]]])
    pinyin_map = jnp.array([[[1, 2, 0]]])
    # rule forces sense 2 on this token
    forced = jnp.array([[2]])
    out = np.asarray(apply_pron_rule(pron_w, pinyin_map, forced))
    np.testing.assert_allclose(out[0, 0], [0.0, 1.0, 0.0], atol=1e-6)
    # no rule -> unchanged
    out2 = np.asarray(apply_pron_rule(pron_w, pinyin_map, jnp.array([[0]])))
    np.testing.assert_allclose(out2[0, 0], [0.3, 0.7, 0.0], atol=1e-6)

    # straight-through: gradient flows as if identity
    def f(w):
        return jnp.sum(apply_pron_rule(w, pinyin_map, forced) * jnp.array([1.0, 2.0, 3.0]))

    g = np.asarray(jax.grad(f)(pron_w))
    np.testing.assert_allclose(g[0, 0], [1.0, 2.0, 3.0], atol=1e-6)


def _toy_dict_msg(B=2, T=3, Lk=5, Lp=4, E=16, seed=0):
    rng = np.random.RandomState(seed)
    keys = jnp.asarray(rng.randn(B, T, Lk, E).astype(np.float32))
    values = jnp.asarray(rng.randn(B, T, Lk, E).astype(np.float32))
    key_map = jnp.asarray(rng.randint(0, 3, size=(B, T, Lk)))
    key_map = key_map.at[:, :, 0].set(1)  # ensure at least one valid gloss token
    pinyin = jnp.asarray(rng.randint(1, 10, size=(B, T, Lp)))
    pinyin_map = jnp.asarray(np.tile([1, 1, 2, 2], (B, T, 1)))
    return DictMsg(keys, values, key_map, pinyin, pinyin_map)


def test_s2pa_attention_shapes_and_normalization():
    dm = _toy_dict_msg()
    x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 8).astype(np.float32))
    mod = S2PAAttention(query_size=8, key_size=16, pinyin_vocab=12)
    params = mod.init(jax.random.PRNGKey(0), x, dm)
    context, align, pron, pron_w = mod.apply(params, x, dm)
    assert context.shape == (2, 3, 8) and pron.shape == (2, 3, 8)
    assert align.shape == (2, 3, 5) and pron_w.shape == (2, 3, 4)
    # attention over valid gloss tokens sums to 1
    np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, atol=1e-5)
    # masked gloss tokens get ~0 weight
    masked = np.asarray(align)[np.asarray(dm.key_map) == 0]
    assert (masked < 1e-6).all()


def test_s2pa_pron_weights_sum_to_pinyin_token_count_per_sense():
    dm = _toy_dict_msg()
    x = jnp.asarray(np.random.RandomState(2).randn(2, 3, 8).astype(np.float32))
    mod = S2PAAttention(query_size=8, key_size=16, pinyin_vocab=12, dropout_rate=0.0)
    params = mod.init(jax.random.PRNGKey(0), x, dm)
    _, align, _, pron_w = mod.apply(params, x, dm)
    # each sense's mass appears once per pinyin token of that sense (2 each here)
    mass = np.asarray(align)
    key_map = np.asarray(dm.key_map)
    sense1 = (mass * (key_map == 1)).sum(-1)
    sense2 = (mass * (key_map == 2)).sum(-1)
    pw = np.asarray(pron_w)
    np.testing.assert_allclose(pw[..., 0], sense1, atol=1e-5)
    np.testing.assert_allclose(pw[..., 1], sense1, atol=1e-5)
    np.testing.assert_allclose(pw[..., 2], sense2, atol=1e-5)
    np.testing.assert_allclose(pw[..., 3], sense2, atol=1e-5)


def test_dict_encoder_end_to_end_shapes():
    dm = _toy_dict_msg(B=2, T=4, E=16)
    tokens = jnp.array([[4, 5, 6, 0], [7, 8, 0, 0]])
    enc = DictEncoder(word_vocab=20, hidden_size=16, num_heads=2, pinyin_vocab=12)
    params = enc.init(jax.random.PRNGKey(0), tokens, dm)
    x, dict_attn, pron_attn, context = enc.apply(params, tokens, dm)
    assert x.shape == (2, 4, 16)
    np.testing.assert_allclose(np.asarray(x[0, 3]), 0.0, atol=1e-6)  # pad masked
    assert pron_attn.shape == (2, 4, 4)
