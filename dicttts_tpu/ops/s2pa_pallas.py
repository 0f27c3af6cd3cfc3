"""Fused Pallas TPU kernel for S2PA gather-attention.

The S2PA computation (models/dict_encoder.py) is a block-diagonal
attention: each text token attends only over its own <=L gloss tokens, then
the attention mass is re-mapped onto pinyin positions by sense id. The XLA
path materializes logits [B,T,L], weights, and the [B,T,L,P] same-sense
one-hot in HBM between fusions; this kernel fuses logits -> mask ->
softmax -> context + sense-sum -> pinyin-scatter into ONE VMEM-resident
pass per token tile (BASELINE.json north star: "S2PA ... becomes a fused
Pallas attention kernel").

Layout: tokens are flattened to rows [N = B*T]; the grid tiles rows by
TILE_R. Per tile, k/v blocks [TILE_R, L, H] stream HBM->VMEM once and all
intermediates stay in registers/VMEM. L and H should be 128-multiples for
lane alignment — `pad_dict_msg` (below) pads L/P as an exact masked
transform; H=192 is 1.5 lanes, acceptable.

Available at inference (deterministic path) via S2PAAttention(use_pallas=...);
training always uses the XLA einsum path (dropout on weights).

Measured on-chip A/B (bench.py `_bench_s2pa_ab`, TPU v5e, r3, long
chains with RTT correction and hoist guards): XLA wins at every
measured geometry — fused is 0.72x at [60,64,64,192], 0.56x at
[60,64,128,192], 0.30x at the B=1 inference shape [1,38,24->128,192].
The kernel's logits reduce is a VPU `sum(k*q)` while XLA maps the
equivalent einsums onto the MXU and fuses the mask/softmax/scatter
around them, so the fusion-saving this kernel provides does not pay on
this chip. Hence `use_pallas_s2pa` defaults to FALSE and the kernel is
kept (equivalence-tested) as an option for hardware where the balance
differs. Earlier rounds' "5x at inference" figure was measurement noise
(20-iteration chains: ~100 us of signal under ~ms relay RTT jitter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9


def pad_dict_msg(keys, values, key_map, pinyin, pinyin_map, lane: int = 128):
    """Pad the gloss axis L to a lane multiple (and the pinyin axis P to 8)
    for the fused kernel. An exact transform: padded gloss columns carry
    key_map 0, which the kernel masks to -1e9 before the softmax, and padded
    pinyin columns carry pinyin_map 0, which the sense one-hot zeroes."""
    L = keys.shape[2]
    pad_l = (-L) % lane
    P = pinyin.shape[2]
    pad_p = (-P) % 8
    if pad_l:
        keys = jnp.pad(keys, ((0, 0), (0, 0), (0, pad_l), (0, 0)))
        values = jnp.pad(values, ((0, 0), (0, 0), (0, pad_l), (0, 0)))
        key_map = jnp.pad(key_map, ((0, 0), (0, 0), (0, pad_l)))
    if pad_p:
        pinyin = jnp.pad(pinyin, ((0, 0), (0, 0), (0, pad_p)))
        pinyin_map = jnp.pad(pinyin_map, ((0, 0), (0, 0), (0, pad_p)))
    return keys, values, key_map, pinyin, pinyin_map


def _s2pa_kernel(q_ref, k_ref, v_ref, key_map_ref, pinyin_map_ref,
                 ctx_ref, weights_ref, pron_ref, *, scale: float):
    # q: [R, H]; k/v: [R, L, H]; key_map: [R, L]; pinyin_map: [R, P]
    q = q_ref[:] * scale
    k = k_ref[:]
    logits = jnp.sum(k * q[:, None, :], axis=-1)  # [R, L] (VPU reduce over H)
    key_map = key_map_ref[:]
    logits = jnp.where(key_map != 0, logits, MASK_VALUE)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # [R, L]
    weights_ref[:] = w
    ctx_ref[:] = jnp.sum(w[:, :, None] * v_ref[:], axis=1)  # [R, H]
    # sense remap: pron[r, p] = sum_l w[r, l] * [key_map==pinyin_map[p] != 0]
    pinyin_map = pinyin_map_ref[:]
    same = (key_map[:, :, None] == pinyin_map[:, None, :]) & (pinyin_map[:, None, :] != 0)
    pron_ref[:] = jnp.sum(w[:, :, None] * same.astype(w.dtype), axis=1)


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def s2pa_fused(q, k, v, key_map, pinyin_map, tile_r: int = 8, interpret: bool = False):
    """Fused S2PA core. q: [B,T,H]; k,v: [B,T,L,H]; key_map: [B,T,L];
    pinyin_map: [B,T,P] -> (context [B,T,H], weights [B,T,L], pron [B,T,P]).

    The q scale is key_size^-0.5 applied by the caller's convention — here
    we take q already projected and apply the reference's 768^-0.5 outside.
    """
    B, T, H = q.shape
    L = k.shape[2]
    P = pinyin_map.shape[2]
    N = B * T
    pad = (-N) % tile_r
    qf = jnp.pad(q.reshape(N, H), ((0, pad), (0, 0)))
    kf = jnp.pad(k.reshape(N, L, H), ((0, pad), (0, 0), (0, 0)))
    vf = jnp.pad(v.reshape(N, L, H), ((0, pad), (0, 0), (0, 0)))
    kmf = jnp.pad(key_map.reshape(N, L).astype(jnp.int32), ((0, pad), (0, 0)))
    pmf = jnp.pad(pinyin_map.reshape(N, P).astype(jnp.int32), ((0, pad), (0, 0)))
    Np = N + pad
    grid = (Np // tile_r,)
    ctx, weights, pron = pl.pallas_call(
        functools.partial(_s2pa_kernel, scale=1.0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, L, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, L, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_r, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, H), q.dtype),
            jax.ShapeDtypeStruct((Np, L), q.dtype),
            jax.ShapeDtypeStruct((Np, P), q.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, kmf, pmf)
    return (
        ctx[:N].reshape(B, T, H),
        weights[:N].reshape(B, T, L),
        pron[:N].reshape(B, T, P),
    )


def s2pa_reference(q, k, v, key_map, pinyin_map):
    """Pure-XLA reference of the same fused math (for tests/benchmarks)."""
    logits = jnp.einsum("btlh,bth->btl", k, q)
    logits = jnp.where(key_map != 0, logits, MASK_VALUE)
    w = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("btl,btlh->bth", w, v)
    same = (key_map[:, :, :, None] == pinyin_map[:, :, None, :]) & (
        pinyin_map[:, :, None, :] != 0
    )
    pron = jnp.einsum("btl,btlp->btp", w, same.astype(w.dtype))
    return ctx, w, pron
