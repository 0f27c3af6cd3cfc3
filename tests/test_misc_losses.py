import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.models.vq import VQEmbeddingEMA
from dicttts_tpu.train.prob_losses import (
    discretized_mix_logistic_loss,
    gaussian_nll,
    laplace_sharpness,
    sample_from_mix_logistic,
)


def test_vq_ema_assign_and_update():
    vq = VQEmbeddingEMA(n_embeddings=8, embedding_dim=4)
    x = jnp.asarray(np.random.RandomState(0).randn(16, 4).astype(np.float32))
    vars0 = vq.init(jax.random.PRNGKey(0), x)
    q, idx, aux = vq.apply(vars0, x)
    assert q.shape == x.shape and idx.shape == (16,)
    assert float(aux["commitment"]) > 0
    # straight-through: grad wrt x is identity through the quantizer
    g = jax.grad(lambda x: jnp.sum(vq.apply(vars0, x)[0]))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    # EMA update changes the codebook in train mode
    q2, _, _ = vq.apply(vars0, x, train=True, mutable=["vq_stats"])[0], None, None
    _, new_vars = vq.apply(vars0, x, train=True, mutable=["vq_stats"])
    assert not np.allclose(
        np.asarray(vars0["vq_stats"]["embedding"]), np.asarray(new_vars["vq_stats"]["embedding"])
    )


def test_mix_logistic_loss_and_sample():
    rng = np.random.RandomState(1)
    y_hat = jnp.asarray(rng.randn(2, 10, 9).astype(np.float32))  # 3 mixtures
    y = jnp.asarray(rng.uniform(-1, 1, (2, 10, 1)).astype(np.float32))
    loss = discretized_mix_logistic_loss(y_hat, y)
    assert np.isfinite(float(loss)) and float(loss) > 0
    s = sample_from_mix_logistic(y_hat, jax.random.PRNGKey(0))
    assert s.shape == (2, 10)
    assert (np.abs(np.asarray(s)) <= 1).all()
    # a sharp correct mixture has lower loss than a random one
    y_hat_good = jnp.concatenate(
        [jnp.zeros((2, 10, 3)), jnp.repeat(y, 3, -1), jnp.full((2, 10, 3), -5.0)], -1
    )
    assert float(discretized_mix_logistic_loss(y_hat_good, y)) < float(loss)


def test_gaussian_nll():
    t = jnp.zeros((4,))
    tight = float(gaussian_nll(t, jnp.full((4,), -2.0), t))
    loose = float(gaussian_nll(t, jnp.zeros(4), t))
    assert tight < loose  # tighter correct gaussian scores better


def test_laplace_sharpness():
    smooth = jnp.ones((1, 16, 16))
    sharp = jnp.asarray(np.random.RandomState(2).randn(1, 16, 16).astype(np.float32))
    assert float(laplace_sharpness(sharp)) > float(laplace_sharpness(smooth))
