import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.models.flows import ResidualCouplingBlock
from dicttts_tpu.models.fvae import FVAE, normal_kl_to_standard, normal_log_prob
from dicttts_tpu.models.wavenet import WN


def test_wn_shapes_and_mask():
    wn = WN(hidden_channels=16, kernel_size=3, n_layers=3, gin_channels=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16).astype(np.float32))
    g = jnp.asarray(np.random.RandomState(1).randn(2, 10, 8).astype(np.float32))
    mask = jnp.ones((2, 10, 1)).at[1, 5:].set(0)
    params = wn.init(jax.random.PRNGKey(0), x, mask, g)
    y = wn.apply(params, x, mask, g)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y[1, 5:]), 0.0, atol=1e-6)


def test_coupling_flow_invertible():
    flow = ResidualCouplingBlock(channels=8, hidden_channels=16, kernel_size=3, n_layers=2, n_flows=2, gin_channels=4)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 12, 8).astype(np.float32))
    g = jnp.asarray(np.random.RandomState(3).randn(2, 12, 4).astype(np.float32))
    mask = jnp.ones((2, 12, 1))
    params = flow.init(jax.random.PRNGKey(0), x, mask, g)
    z = flow.apply(params, x, mask, g, reverse=False)
    x_back = flow.apply(params, z, mask, g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)
    # zero-init post conv => identity at init is NOT expected after training,
    # but at init coupling shift is 0 so flow == repeated flips
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)


def test_normal_log_prob_and_kl():
    x = jnp.array([0.5])
    lp = float(normal_log_prob(x, jnp.zeros(1), jnp.zeros(1))[0])
    ref = -0.5 * (np.log(2 * np.pi) + 0.25)
    assert abs(lp - ref) < 1e-6
    kl = float(normal_kl_to_standard(jnp.zeros(1), jnp.zeros(1))[0])
    assert abs(kl) < 1e-7  # KL(N(0,1)||N(0,1)) = 0


def _make_fvae(use_flow):
    return FVAE(
        in_out_channels=8,
        hidden_channels=16,
        latent_size=4,
        kernel_size=3,
        enc_n_layers=2,
        dec_n_layers=2,
        gin_channels=12,
        strides=(4,),
        use_prior_flow=use_flow,
        flow_hidden=8,
        flow_n_steps=2,
    )


def test_fvae_train_and_infer_paths():
    B, T, C = 2, 16, 8
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    for use_flow in [False, True]:
        fvae = _make_fvae(use_flow)
        x = jnp.asarray(np.random.RandomState(0).randn(B, T, C).astype(np.float32))
        g = jnp.asarray(np.random.RandomState(1).randn(B, T, 12).astype(np.float32))
        mask = jnp.ones((B, T, 1))
        params = fvae.init(rngs, x, mask, g)
        recon, kl, z_p, m_q, logs_q = fvae.apply(params, x, mask, g, rngs={"sample": jax.random.PRNGKey(2)})
        assert recon.shape == (B, T, C)
        assert m_q.shape == (B, T // 4, 4)
        assert np.isfinite(float(kl))
        wav_out, z = fvae.apply(
            params, g=g, infer=True, rngs={"sample": jax.random.PRNGKey(3)}
        )
        assert wav_out.shape == (B, T, C)
        assert z.shape == (B, T // 4, 4)


def test_fvae_semantics_changes_prior_not_decoder_path():
    fvae = _make_fvae(False)
    B, T = 1, 8
    x = jnp.ones((B, T, 8))
    g = jnp.ones((B, T, 12))
    sem = 2.0 * jnp.ones((B, T, 12))
    mask = jnp.ones((B, T, 1))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = fvae.init(rngs, x, mask, g)
    _, kl_a, *_ = fvae.apply(params, x, mask, g, rngs={"sample": jax.random.PRNGKey(2)})
    _, kl_b, *_ = fvae.apply(params, x, mask, g, semantics=sem, rngs={"sample": jax.random.PRNGKey(2)})
    assert float(kl_a) != float(kl_b)  # semantics conditions the encoder path
