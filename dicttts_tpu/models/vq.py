"""EMA vector quantization (VQ-VAE) embedding.

Capability parity with /root/reference/modules/commons/vqvae.py:7-87
(VQEmbeddingEMA, used by the reference's VQVAE variance encoder registry):
nearest-codebook assignment with exponential-moving-average codebook
updates (Laplace-smoothed counts) and straight-through gradients. EMA
statistics live in a flax 'batch_stats'-style mutable collection so the
update stays inside the jitted train step.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class VQEmbeddingEMA(nn.Module):
    n_embeddings: int
    embedding_dim: int
    decay: float = 0.999
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [..., D] -> (quantized [..., D], indices [...], losses dict)
        emb = self.variable(
            "vq_stats", "embedding",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (self.n_embeddings, self.embedding_dim)) * 0.1,
        )
        ema_count = self.variable("vq_stats", "ema_count", lambda: jnp.zeros(self.n_embeddings))
        ema_weight = self.variable("vq_stats", "ema_weight", lambda: jnp.array(emb.value))

        flat = x.reshape(-1, self.embedding_dim)
        d = (
            jnp.sum(flat**2, 1, keepdims=True)
            - 2 * flat @ emb.value.T
            + jnp.sum(emb.value**2, 1)[None, :]
        )
        idx = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(idx, self.n_embeddings, dtype=flat.dtype)
        quantized = (onehot @ emb.value).reshape(x.shape)

        if train:
            count = jnp.sum(onehot, axis=0)
            new_count = self.decay * ema_count.value + (1 - self.decay) * count
            n = jnp.sum(new_count)
            new_count = (new_count + self.epsilon) / (n + self.n_embeddings * self.epsilon) * n
            dw = onehot.T @ flat
            new_weight = self.decay * ema_weight.value + (1 - self.decay) * dw
            ema_count.value = new_count
            ema_weight.value = new_weight
            emb.value = new_weight / new_count[:, None]

        commitment = jnp.mean(jnp.square(x - jax.lax.stop_gradient(quantized)))
        # straight-through estimator
        quantized_st = x + jax.lax.stop_gradient(quantized - x)
        avg_probs = jnp.mean(onehot, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        return quantized_st, idx.reshape(x.shape[:-1]), {
            "commitment": commitment,
            "perplexity": perplexity,
        }
