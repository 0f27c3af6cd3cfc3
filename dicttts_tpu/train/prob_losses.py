"""Probabilistic output losses: discretized mixture of logistics, gaussian.

Capability parity with /root/reference/modules/commons/mixture.py (the
PixelCNN++-style discretized mix-of-logistics over mel bins) and
gaussian.py (diagonal gaussian NLL) — alternative mel-decoder objectives
reachable from the reference's loss registry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discretized_mix_logistic_loss(
    y_hat: jnp.ndarray, y: jnp.ndarray, num_classes: int = 256, log_scale_min: float = -7.0
) -> jnp.ndarray:
    """y_hat: [B, T, 3*M] (logit_probs, means, log_scales per mixture);
    y: [B, T, 1] targets in [-1, 1]. Returns mean NLL."""
    n_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :n_mix]
    means = y_hat[..., n_mix : 2 * n_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * n_mix :], log_scale_min)
    centered = y - means
    inv_std = jnp.exp(-log_scales)
    half = 1.0 / (num_classes - 1)
    plus_in = inv_std * (centered + half)
    min_in = inv_std * (centered - half)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # log sigmoid
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_std * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)
    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2.0),
    )
    log_probs = jnp.where(
        y < -0.999, log_cdf_plus, jnp.where(y > 0.999, log_one_minus_cdf_min, inner)
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return -jnp.mean(jax.nn.logsumexp(log_probs, axis=-1))


def sample_from_mix_logistic(y_hat: jnp.ndarray, rng, log_scale_min: float = -7.0) -> jnp.ndarray:
    n_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :n_mix]
    r1, r2 = jax.random.split(rng)
    comp = jax.random.categorical(r1, logit_probs)
    onehot = jax.nn.one_hot(comp, n_mix)
    means = jnp.sum(y_hat[..., n_mix : 2 * n_mix] * onehot, -1)
    log_scales = jnp.maximum(jnp.sum(y_hat[..., 2 * n_mix :] * onehot, -1), log_scale_min)
    u = jax.random.uniform(r2, means.shape, minval=1e-5, maxval=1 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)


def gaussian_nll(mean: jnp.ndarray, log_std: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Diagonal gaussian negative log likelihood, mean-reduced."""
    return jnp.mean(
        0.5 * (jnp.log(2 * jnp.pi) + 2 * log_std + jnp.exp(-2 * log_std) * jnp.square(target - mean))
    )


def laplace_sharpness(mel: jnp.ndarray) -> jnp.ndarray:
    """Spectrogram sharpness metric (reference utils/metrics.py laplace
    kernel response mean)."""
    kernel = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])[..., None, None]
    x = mel[:, :, :, None]
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jnp.mean(jnp.abs(y))
