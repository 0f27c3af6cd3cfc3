"""Post-net Glow: exact invertibility, logdet correctness vs the autodiff
Jacobian, cross-half mixing, WN sharing, and mask behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicttts_tpu.models.post_glow import (
    ActNorm,
    Glow,
    GlowCoupling,
    InvConvNear,
    squeeze,
    unsqueeze,
)


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_squeeze_round_trip():
    x = _rand(2, 10, 6)
    sq, m = squeeze(x, None, 2)
    assert sq.shape == (2, 5, 12)
    un, _ = unsqueeze(sq, m, 2)
    np.testing.assert_allclose(np.asarray(un), np.asarray(x), atol=1e-6)


@pytest.fixture(scope="module")
def glow():
    model = Glow(
        in_channels=8, hidden_channels=16, kernel_size=3, n_blocks=4,
        n_block_layers=2, n_split=4, n_sqz=2, gin_channels=6, share_wn_layers=2,
    )
    x = _rand(2, 12, 8)
    g = _rand(2, 12, 6, seed=1)
    mask = jnp.ones((2, 12, 1))
    params = model.init(jax.random.PRNGKey(0), x, mask, g)
    return model, params, x, g, mask


def test_forward_reverse_round_trip(glow):
    model, params, x, g, mask = glow
    z, ld = model.apply(params, x, mask, g)
    x_rec, ld_rev = model.apply(params, z, mask, g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_rev), rtol=1e-3, atol=1e-4)


def test_glow_perturbs_all_channels(glow):
    """Every mel channel must be transformed non-trivially (this is what the
    InvConvNear cross-half interleave guarantees)."""
    model, params, x, g, mask = glow
    z, _ = model.apply(params, x, mask, g)
    delta = np.abs(np.asarray(z) - np.asarray(x)).mean(axis=(0, 1))
    assert np.all(delta > 1e-5), delta


def _logdet_vs_jacobian(module, params, x, *args, **kwargs):
    B, T, C = x.shape
    flat = x.reshape(-1)

    def f(v):
        y, _ = module.apply(params, v.reshape(B, T, C), *args, **kwargs)
        return y.reshape(-1)

    J = jax.jacfwd(f)(flat)
    _, ld = module.apply(params, x, *args, **kwargs)
    sign, ref = np.linalg.slogdet(np.asarray(J))
    return float(jnp.sum(ld)), float(ref)


def test_actnorm_logdet_exact():
    x = _rand(1, 4, 6)
    mask = jnp.ones((1, 4, 1))
    mod = ActNorm(6)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    # give it a non-trivial scale
    params = jax.tree_util.tree_map(lambda p: p + 0.3, params)
    got, ref = _logdet_vs_jacobian(mod, params, x, mask)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_invconv_logdet_exact():
    x = _rand(1, 3, 8)
    mask = jnp.ones((1, 3, 1))
    mod = InvConvNear(8, 4)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    # orthogonal init has |det| = 1 (logdet ~ 0); perturb for a real check
    params = jax.tree_util.tree_map(lambda p: p + 0.2, params)
    got, ref = _logdet_vs_jacobian(mod, params, x, mask)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_coupling_logdet_exact():
    x = _rand(1, 4, 6)
    mask = jnp.ones((1, 4, 1))
    mod = GlowCoupling(6, 8, 3, 2)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    # zero-init post conv makes logs 0; nudge params for a real test
    params = jax.tree_util.tree_map(lambda p: p + 0.1, params)
    got, ref = _logdet_vs_jacobian(mod, params, x, mask)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_whole_glow_logdet_matches_jacobian():
    mod = Glow(
        in_channels=4, hidden_channels=8, kernel_size=3, n_blocks=2,
        n_block_layers=1, n_split=4, n_sqz=2, gin_channels=0,
    )
    x = _rand(1, 4, 4)
    mask = jnp.ones((1, 4, 1))
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    params = jax.tree_util.tree_map(lambda p: p + 0.05, params)
    got, ref = _logdet_vs_jacobian(mod, params, x, mask)
    np.testing.assert_allclose(got, ref, rtol=1e-3)


def test_share_wn_layers_param_count():
    def n_wn_stacks(share):
        mod = Glow(
            in_channels=8, hidden_channels=16, kernel_size=3, n_blocks=4,
            n_block_layers=2, share_wn_layers=share,
        )
        x = _rand(1, 4, 8)
        params = mod.init(jax.random.PRNGKey(0), x, jnp.ones((1, 4, 1)))
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = {jax.tree_util.keystr(p) for p, _ in flat}
        return sum(1 for n in names if "in_0']['kernel" in n)

    assert n_wn_stacks(0) == 4  # one WN per block
    assert n_wn_stacks(2) == 2  # shared across runs of 2 blocks


def test_masked_frames_do_not_change_logdet(glow):
    model, params, x, g, _ = glow
    mask = jnp.ones((2, 12, 1)).at[:, 8:].set(0.0)
    xm = x * mask
    z, ld = model.apply(params, xm, mask, g)
    # logdet must only count valid frames: shortening the input to the valid
    # prefix gives the same logdet
    z2, ld2 = model.apply(params, xm[:, :8], mask[:, :8], g[:, :8])
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z[:, :4]), np.asarray(z2[:, :4]), rtol=1e-4, atol=1e-5)
