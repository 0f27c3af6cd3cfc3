"""Gather-fused S2PA attention over the device-resident dict bank.

The train-time S2PA path (tasks/dict_tts.py `_dict_msg` +
models/dict_encoder.py XLA branch) first materializes the gathered bank
rows ``keys = bank[word_tokens]`` — a [B,Tw,L,E] bf16 array (~566 MB at the
production geometry 60x64x96x768) — then re-reads it for the logits einsum,
the context einsum, and twice more in the backward pass (d_q_e and
d_weights): ~2.8 GB of HBM traffic per step for ~0.5 GFLOP of useful math.
The computation is pure bandwidth.

This kernel removes the materialization entirely: word ids ride a scalar-
prefetch argument and the *BlockSpec index_map itself* performs the gather —
each grid step's R bank rows stream HBM→VMEM once (Pallas double-buffers
block fetches across grid steps), and logits → mask → softmax → dropout →
context all happen in VMEM. Total bank traffic per training step drops to
2 reads (fwd + recompute in bwd) ≈ 1.1 GB.

Measured reality (DISPATCH_r05.md): the ISOLATED A/B loses to XLA — the
XLA gather+einsum chain runs at the 566 MB single-read floor (0.68 ms fwd
vs this kernel's 1.46; 8 row-DMAs per grid step pipeline worse than XLA's
bulk gather) — but the FULL production train step WINS with the kernel:
21.05 vs 22.42 ms at the 60x512 geometry, because not materializing the
566 MB intermediate frees bandwidth/scheduling for everything else in the
step. Hence `s2pa_bank_fused: true` in the production recipe (TPU-gated;
CPU falls back to the XLA path).

Gradients: the bank is training-constant (it is carried in train state under
``_const_`` and never differentiated), so the custom VJP recomputes the
softmax from the re-gathered rows and emits d_q_e only; the bank cotangent
is a symbolic zero (DCE'd — never materialized).

Reference semantics: modules/dict_tts/layers/dict_encoder.py:46-57
(logits -> mask_logits -> softmax -> attn_dropout -> context); the sense
remap onto pinyin positions stays outside the kernel (it reads only the
[B,T,L] weights, which the kernel returns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9
TILE_R = 8  # word slots per grid step; R bank rows in flight per step


def _row_dot(a, b, contract_a, contract_b):
    """2-D x 2-D dot_general (Mosaic supports arbitrary 2-D contractions;
    BATCHED 3-D dot_general does not lower — hence the static per-row
    unroll in the kernels below)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((contract_a,), (contract_b,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(wt_ref, qe_ref, km_ref, mask_ref, *refs):
    # refs = (k_0..k_{R-1} [1, L, E]) + (ctx_ref [R, E], w_ref [R, L])
    k_refs, (ctx_ref, w_ref) = refs[:TILE_R], refs[TILE_R:]
    qe = qe_ref[:]  # [R, E]
    km = km_ref[:]
    mask = mask_ref[:]
    for j in range(TILE_R):
        k_j = k_refs[j][0]  # [L, E]
        # logits[l] = sum_e qe[j, e] * k_j[l, e]  -> [1, L]
        logits = _row_dot(qe[j:j + 1], k_j, 1, 1)
        logits = jnp.where(km[j:j + 1] != 0, logits, MASK_VALUE)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)  # [1, L] f32
        w_ref[j:j + 1, :] = w
        wd = (w * mask[j:j + 1]).astype(k_j.dtype)
        # ctx[e] = sum_l wd[l] * k_j[l, e] -> [1, E]
        ctx = _row_dot(wd, k_j, 1, 0)
        ctx_ref[j:j + 1, :] = ctx.astype(ctx_ref.dtype)


def _bwd_kernel(wt_ref, qe_ref, km_ref, mask_ref, gctx_ref, gw_ref, *refs):
    k_refs, (dqe_ref,) = refs[:TILE_R], refs[TILE_R:]
    qe = qe_ref[:]
    km = km_ref[:]
    mask = mask_ref[:]
    for j in range(TILE_R):
        k_j = k_refs[j][0]  # [L, E]
        logits = _row_dot(qe[j:j + 1], k_j, 1, 1)  # [1, L]
        logits = jnp.where(km[j:j + 1] != 0, logits, MASK_VALUE)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)  # recomputed [1, L]
        # d_wd[l] = sum_e g_ctx[e] * k_j[l, e]
        d_wd = _row_dot(gctx_ref[j:j + 1, :].astype(k_j.dtype), k_j, 1, 1)
        d_w = d_wd * mask[j:j + 1] + gw_ref[j:j + 1, :]
        # softmax vjp: d_logits = w * (d_w - sum_l w * d_w)
        d_logits = w * (d_w - jnp.sum(w * d_w, axis=-1, keepdims=True))
        # d_qe[e] = sum_l d_logits[l] * k_j[l, e]
        d_qe = _row_dot(d_logits.astype(k_j.dtype), k_j, 1, 0)
        dqe_ref[j:j + 1, :] = d_qe.astype(dqe_ref.dtype)


def _row_specs(L: int, E: int):
    """R BlockSpecs, the j-th fetching bank row wt[i*R + j] — the gather IS
    the index_map (scalar-prefetched word ids pick the block)."""
    def mk(j):
        return pl.BlockSpec(
            (1, L, E), lambda i, wt: (wt[i * TILE_R + j], 0, 0),
            memory_space=pltpu.VMEM,
        )
    return [mk(j) for j in range(TILE_R)]


def _pad_rows(x, n_pad):
    return jnp.pad(x, ((0, n_pad),) + ((0, 0),) * (x.ndim - 1))


def _fwd_call(bank, wt, qe, km, mask, interpret=False):
    V, L, E = bank.shape
    N = wt.shape[0]
    pad = (-N) % TILE_R
    Np = N + pad
    wt_p = jnp.pad(wt, (0, pad))  # pad rows gather row wt=0 (harmless)
    qe_p, km_p, mask_p = _pad_rows(qe, pad), _pad_rows(km, pad), _pad_rows(mask, pad)
    grid = (Np // TILE_R,)
    row = lambda i, wt: (i, 0)
    ctx, w = pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_R, E), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, L), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, L), row, memory_space=pltpu.VMEM),
                *_row_specs(L, E),
            ],
            out_specs=[
                pl.BlockSpec((TILE_R, E), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, L), row, memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Np, E), qe.dtype),
            jax.ShapeDtypeStruct((Np, L), jnp.float32),
        ],
        interpret=interpret,
    )(wt_p, qe_p, km_p, mask_p, *([bank] * TILE_R))
    return ctx[:N], w[:N]


def _bwd_call(bank, wt, qe, km, mask, g_ctx, g_w, interpret=False):
    V, L, E = bank.shape
    N = wt.shape[0]
    pad = (-N) % TILE_R
    Np = N + pad
    wt_p = jnp.pad(wt, (0, pad))
    qe_p, km_p, mask_p = _pad_rows(qe, pad), _pad_rows(km, pad), _pad_rows(mask, pad)
    gctx_p, gw_p = _pad_rows(g_ctx, pad), _pad_rows(g_w, pad)
    grid = (Np // TILE_R,)
    row = lambda i, wt: (i, 0)
    (d_qe,) = pl.pallas_call(
        _bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_R, E), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, L), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, L), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, E), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, L), row, memory_space=pltpu.VMEM),
                *_row_specs(L, E),
            ],
            out_specs=[
                pl.BlockSpec((TILE_R, E), row, memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((Np, E), qe.dtype)],
        interpret=interpret,
    )(wt_p, qe_p, km_p, mask_p, gctx_p, gw_p, *([bank] * TILE_R))
    return d_qe[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def s2pa_bank_attend(bank, wt, qe, km, mask, interpret=False):
    """Fused gather-attention over the dict bank.

    bank: [V, L, E] (bf16/f32, HBM-resident) — gloss-token features per
          word-vocab id; TRAINING-CONSTANT (its cotangent is symbolic zero).
    wt:   [N] int32 flattened word ids (N = B*Tw)
    qe:   [N, E] query already projected to bank space AND scaled
    km:   [N, L] int32 gathered key_map (0 = masked gloss token)
    mask: [N, L] dropout keep-scale on the attention weights
          (1/keep_prob or 0; ones at eval)

    Returns (ctx_e [N, E] — pre-w_v context in bank space, w [N, L] f32 —
    PRE-dropout softmax weights, for diagnostics and the sense remap).
    """
    return _fwd_call(bank, wt, qe, km, mask, interpret=interpret)


def _attend_fwd(bank, wt, qe, km, mask, interpret):
    out = _fwd_call(bank, wt, qe, km, mask, interpret=interpret)
    return out, (bank, wt, qe, km, mask)


def _attend_bwd(interpret, res, g):
    bank, wt, qe, km, mask = res
    g_ctx, g_w = g
    d_qe = _bwd_call(bank, wt, qe, km, mask, g_ctx, g_w, interpret=interpret)
    # bank is training-constant: symbolic-zero cotangent (XLA DCEs it);
    # wt/km are ints (float0 zeros); mask gets no gradient by design
    # (matches nn.Dropout's straight-through scale).
    import numpy as np

    zint = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (jnp.zeros_like(bank), zint(wt), d_qe, zint(km),
            jnp.zeros_like(mask))


s2pa_bank_attend.defvjp(_attend_fwd, _attend_bwd)
