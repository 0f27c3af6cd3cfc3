"""Gather-fused S2PA bank kernel (ops/s2pa_bank_pallas.py): equivalence
with the XLA gather+einsum path, forward and backward, plus the full
DictEncoder bank-mode wiring (keys.ndim==3 + word_tokens).

Runs in Pallas interpreter mode on CPU (the kernel auto-selects interpret
off-TPU); the on-chip A/B lives in scripts/ablate_fine.py (s2pa_bank_grad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicttts_tpu.models.dict_encoder import S2PA_MASK_VALUE, DictMsg, sense_remap
from dicttts_tpu.ops.s2pa_bank_pallas import s2pa_bank_attend

V, L, E, N = 24, 16, 128, 21  # N deliberately not a TILE_R multiple


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    bank = jnp.asarray(rng.randn(V, L, E).astype(np.float32) * 0.3)
    wt = jnp.asarray(rng.randint(0, V, (N,)).astype(np.int32))
    qe = jnp.asarray(rng.randn(N, E).astype(np.float32) * 0.2)
    km_bank = (rng.randint(0, 4, (V, L)) + (np.arange(L) == 0)).astype(np.int32)
    km_bank[3] = 0  # one all-masked word row (pad-word shape)
    km = jnp.asarray(km_bank)[wt]
    mask = jnp.asarray((rng.rand(N, L) > 0.1).astype(np.float32) / 0.9)
    return bank, wt, qe, km, mask


def _xla_ref(bank, wt, qe, km, mask):
    keys = bank[wt]  # [N, L, E]
    logits = jnp.einsum("nle,ne->nl", keys, qe)
    logits = jnp.where(km != 0, logits, S2PA_MASK_VALUE)
    w = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("nl,nle->ne", w * mask, keys)
    return ctx, w


def test_forward_matches_xla():
    bank, wt, qe, km, mask = _inputs()
    ctx_k, w_k = s2pa_bank_attend(bank, wt, qe, km, mask, True)
    ctx_r, w_r = _xla_ref(bank, wt, qe, km, mask)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ctx_k), np.asarray(ctx_r), atol=2e-5)


def test_backward_matches_xla():
    bank, wt, qe, km, mask = _inputs(1)

    def loss_kernel(qe):
        ctx, w = s2pa_bank_attend(bank, wt, qe, km, mask, True)
        return jnp.sum(ctx**2) + jnp.sum(jnp.sin(w))

    def loss_ref(qe):
        ctx, w = _xla_ref(bank, wt, qe, km, mask)
        return jnp.sum(ctx**2) + jnp.sum(jnp.sin(w))

    g_k = jax.grad(loss_kernel)(qe)
    g_r = jax.grad(loss_ref)(qe)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), rtol=2e-4, atol=2e-4)


def test_dict_encoder_bank_mode_matches_gathered():
    """Full module: DictEncoder with the un-gathered [V,L,E] bank must
    reproduce the standard gathered-keys path bit-close (deterministic)."""
    from dicttts_tpu.models.dict_encoder import DictEncoder

    rng = np.random.RandomState(2)
    B, T, P = 2, 7, 6
    bank = jnp.asarray(rng.randn(V, L, E).astype(np.float32) * 0.3)
    km_bank = jnp.asarray((rng.randint(0, 3, (V, L)) + (np.arange(L) == 0)).astype(np.int32))
    pin_bank = jnp.asarray(rng.randint(1, 50, (V, P)).astype(np.int32))
    pm_bank = jnp.asarray(np.tile([1, 1, 2, 2, 0, 0], (V, 1)).astype(np.int32))
    wt = jnp.asarray(rng.randint(1, V, (B, T)).astype(np.int32))
    pron_mod = jnp.zeros((B, T), jnp.int32)

    enc = DictEncoder(word_vocab=64, hidden_size=32, num_heads=2, dropout=0.0,
                      pinyin_vocab=50)
    km, pin, pm = km_bank[wt], pin_bank[wt], pm_bank[wt]
    dm_gathered = DictMsg(bank[wt], bank[wt], km, pin, pm)
    dm_bank = DictMsg(bank, bank, km, pin, pm)

    params = enc.init({"params": jax.random.PRNGKey(0)}, wt, dm_gathered,
                      pron_mod, True)["params"]
    out_g = enc.apply({"params": params}, wt, dm_gathered, pron_mod, True)
    out_b = enc.apply({"params": params}, wt, dm_bank, pron_mod, True)
    for a, b, tol in zip(out_g, out_b, (2e-5, 2e-6, 2e-6, 2e-5)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)


def test_grad_flow_through_module():
    """Training-path gradients (params) agree between the two modes."""
    from dicttts_tpu.models.dict_encoder import DictEncoder

    rng = np.random.RandomState(3)
    B, T, P = 2, 5, 4
    bank = jnp.asarray(rng.randn(V, L, E).astype(np.float32) * 0.3)
    km_bank = jnp.asarray((rng.randint(1, 3, (V, L))).astype(np.int32))
    pin_bank = jnp.asarray(rng.randint(1, 50, (V, P)).astype(np.int32))
    pm_bank = jnp.asarray(np.tile([1, 1, 2, 2], (V, 1)).astype(np.int32))
    wt = jnp.asarray(rng.randint(1, V, (B, T)).astype(np.int32))

    enc = DictEncoder(word_vocab=64, hidden_size=32, num_heads=2, dropout=0.0,
                      pinyin_vocab=50)
    km, pin, pm = km_bank[wt], pin_bank[wt], pm_bank[wt]
    dm_gathered = DictMsg(bank[wt], bank[wt], km, pin, pm)
    dm_bank = DictMsg(bank, bank, km, pin, pm)
    params = enc.init({"params": jax.random.PRNGKey(0)}, wt, dm_gathered,
                      None, True)["params"]

    def loss(p, dm):
        x, _, pron_attn, _ = enc.apply(
            {"params": p}, wt, dm, None, True)
        return jnp.sum(x**2) + jnp.sum(pron_attn**2)

    g_g = jax.grad(loss)(params, dm_gathered)
    g_b = jax.grad(loss)(params, dm_bank)
    flat_g = jax.tree.leaves(g_g)
    flat_b = jax.tree.leaves(g_b)
    assert len(flat_g) == len(flat_b)
    for a, b in zip(flat_g, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_dropout_mask_statistics():
    """Train mode draws a bernoulli keep-scale; eval is exact. Check the
    bank path accepts non-deterministic mode and produces finite outputs
    with the same shapes."""
    from dicttts_tpu.models.dict_encoder import DictEncoder

    rng = np.random.RandomState(4)
    B, T, P = 2, 5, 4
    bank = jnp.asarray(rng.randn(V, L, E).astype(np.float32) * 0.3)
    km_bank = jnp.asarray((rng.randint(1, 3, (V, L))).astype(np.int32))
    pin_bank = jnp.asarray(rng.randint(1, 50, (V, P)).astype(np.int32))
    pm_bank = jnp.asarray(np.tile([1, 1, 2, 2], (V, 1)).astype(np.int32))
    wt = jnp.asarray(rng.randint(1, V, (B, T)).astype(np.int32))
    enc = DictEncoder(word_vocab=64, hidden_size=32, num_heads=2, dropout=0.2,
                      pinyin_vocab=50)
    km, pin, pm = km_bank[wt], pin_bank[wt], pm_bank[wt]
    dm_bank = DictMsg(bank, bank, km, pin, pm)
    params = enc.init({"params": jax.random.PRNGKey(0)}, wt,
                      DictMsg(bank[wt], bank[wt], km, pin, pm), None, True)["params"]
    out = enc.apply({"params": params}, wt, dm_bank, None, False,
                    rngs={"dropout": jax.random.PRNGKey(7)})
    for o in out:
        assert np.all(np.isfinite(np.asarray(o)))
