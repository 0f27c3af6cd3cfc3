"""PCM output encodings for the serving path.

G.711-style mu-law companding halves the bytes a serving caller pulls per
utterance vs int16 PCM (1 byte/sample). Behind this sandbox's relay the
B=1 serving latency is transport-dominated (BENCH_r05: 7.5 ms of the
40 ms p50 is the 311 KB int16 pull at ~42 MB/s), so mu-law output moves
p50 below the RTT+12 ms bar; on real hardware it is simply the telephony
output format. Pure jnp so it fuses into the serving jit (the encode is
elementwise on the vocoder output — zero extra HBM passes).
"""

from __future__ import annotations

import jax.numpy as jnp


def mulaw_encode(x: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    """float waveform in [-1, 1] -> uint8 mu-law code (ITU-T G.711 shape)."""
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(jnp.float32(mu))
    return ((y + 1.0) * 127.5 + 0.5).astype(jnp.uint8)


def mulaw_decode(u: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    """uint8 mu-law code -> float waveform in [-1, 1]."""
    y = u.astype(jnp.float32) / 127.5 - 1.0
    return jnp.sign(y) * (jnp.power(1.0 + mu, jnp.abs(y)) - 1.0) / mu
