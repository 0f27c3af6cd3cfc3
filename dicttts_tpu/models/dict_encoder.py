"""Semantics-to-pronunciation attention (S2PA) — the Dict-TTS core novelty.

Capability parity with the reference
(/root/reference/modules/dict_tts/layers/dict_encoder.py:17-171 and
layers/utils.py), fully vectorized for TPU:

- Each input character (word token) attends over ONLY its own dictionary
  entry's gloss tokens — a block-diagonal attention expressed as a batched
  per-token contraction, never a [T*L, T*L] matrix.
- `sense_remap` replaces the reference's python loop over sense ids
  (`mask_weights_attn`, layers/utils.py:49-58) with a single boolean
  one-hot contraction: attention mass is summed per sense id via the
  key_map and broadcast onto that sense's pinyin-token positions via the
  pinyin_map.
- `apply_pron_rule` replaces the loop in `add_pron_rule`
  (layers/utils.py:109-115) with a masked straight-through overwrite: rows
  whose sandhi rule forces sense i get a hard one-hot over that sense's
  pinyin tokens in the forward pass while gradients flow to the soft
  weights.

Dict-bank tensors (built offline, see SURVEY.md §2.4 ZhBinarizer):
  keys/values: [B, T_w, L_k, E]  RoFormer gloss-token embeddings (E=768)
  key_map:     [B, T_w, L_k]     1-based sense id per gloss token (0=pad)
  pinyin:      [B, T_w, L_p]     pinyin token ids (0=pad)
  pinyin_map:  [B, T_w, L_p]     1-based sense id per pinyin token (0=pad)
  pron_modified: [B, T_w]        forced sense id from tone-sandhi (0=none)
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.layers import RelTransformerLayers
from dicttts_tpu.ops.amp import cdtype

S2PA_MASK_VALUE = -1e9  # reference mask_logits uses -1e9


class _DenseKernel(nn.Module):
    """Bias-free Dense whose kernel is used EXPLICITLY for reassociated
    matmuls. Param path matches nn.Dense ('<name>/kernel', [in, out]) so the
    torch converter and checkpoints are unaffected."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )


class DictMsg(NamedTuple):
    keys: jnp.ndarray
    values: jnp.ndarray
    key_map: jnp.ndarray
    pinyin: jnp.ndarray
    pinyin_map: jnp.ndarray


def sense_remap(weights: jnp.ndarray, key_map: jnp.ndarray, pinyin_map: jnp.ndarray) -> jnp.ndarray:
    """Re-map gloss-token attention onto pinyin-token positions by sense id.

    weights: [B, T, L_k]; key_map: [B, T, L_k]; pinyin_map: [B, T, L_p].
    out[b,t,p] = sum_l weights[b,t,l] * 1[key_map[b,t,l] == pinyin_map[b,t,p] != 0]
    """
    same_sense = (key_map[:, :, :, None] == pinyin_map[:, :, None, :]) & (
        pinyin_map[:, :, None, :] != 0
    )
    return jnp.einsum("btl,btlp->btp", weights, same_sense.astype(weights.dtype))


def gumbel_softmax(logits: jnp.ndarray, temperature: float, hard: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Straight-through Gumbel softmax (reference layers/utils.py:79-107).

    rng=None skips the Gumbel noise (deterministic eval: plain softmax, plus
    the ST hard one-hot when hard=True)."""
    y = logits
    if rng is not None:
        y = y + jax.random.gumbel(rng, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax(y / temperature, axis=-1)
    if not hard:
        return y_soft
    y_hard = jax.nn.one_hot(jnp.argmax(y_soft, -1), logits.shape[-1], dtype=logits.dtype)
    return y_soft + jax.lax.stop_gradient(y_hard - y_soft)


def sense_remap_grouped(
    weights: jnp.ndarray,
    key_map: jnp.ndarray,
    pinyin_map: jnp.ndarray,
    max_senses: int,
    mode: str = "sense",
    temperature: float = 0.8,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sense-grouped remap — the reference's Gumbel variant
    (mask_weights_attn_gumbel, layers/utils.py:60-77): gloss-token attention
    is first SUMMED per sense id, renormalized over senses (softmax, or
    straight-through Gumbel softmax for the unreleased hard variant,
    readme.md:135-138), then broadcast onto each sense's pinyin positions.

    The reference loops python-side over ``key_map.max()`` sense ids; here
    both the merge and the broadcast are one-hot einsum contractions over a
    STATIC ``max_senses`` axis (sense ids are 1-based; id 0 = pad).
    """
    sense_ids = jnp.arange(1, max_senses + 1)
    key_oh = (key_map[..., None] == sense_ids).astype(weights.dtype)  # [B,T,L,S]
    merged = jnp.einsum("btl,btls->bts", weights, key_oh)
    has_sense = jnp.einsum("btls->bts", key_oh) > 0
    logits = jnp.where(has_sense, merged, S2PA_MASK_VALUE)
    if mode == "gumbel":
        sel = gumbel_softmax(logits, temperature, hard=True, rng=rng)
    else:  # 'sense' — the reference's shipped line: merge_value.softmax(-1)
        sel = jax.nn.softmax(logits, axis=-1)
    sel = sel * has_sense.astype(weights.dtype)
    pin_oh = (pinyin_map[..., None] == sense_ids).astype(weights.dtype)  # [B,T,P,S]
    return jnp.einsum("bts,btps->btp", sel, pin_oh)


def apply_pron_rule(pron_weights: jnp.ndarray, pinyin_map: jnp.ndarray, pron_modified: jnp.ndarray) -> jnp.ndarray:
    """Straight-through hard override of rows with a forced pronunciation.

    Where pron_modified[b,t] = i > 0, the forward value becomes the indicator
    of sense i over pinyin positions; gradients flow to the soft weights
    unchanged (reference add_pron_rule semantics).
    """
    rule = pron_modified > 0  # [B, T]
    hard = (pinyin_map == pron_modified[:, :, None]).astype(pron_weights.dtype)
    delta = jnp.where(rule[:, :, None], hard - pron_weights, 0.0)
    return pron_weights + jax.lax.stop_gradient(delta)


class S2PAAttention(nn.Module):
    """Per-character attention over its dictionary gloss tokens + pron head.

    Two compute paths: the fused Pallas kernel (ops/s2pa_pallas.py, one
    VMEM-resident pass; used on TPU when deterministic — no weight dropout)
    and the XLA einsum path (training, with dropout on the weights).
    """

    query_size: int
    key_size: int = 768
    pinyin_vocab: int = 185  # value_embedding_size
    dropout_rate: float = 0.1
    use_pallas: bool = False
    # 'token' = released model (token-mass remap); 'sense'/'gumbel' = the
    # sense-grouped softmax / ST-Gumbel variants (layers/utils.py:60-107)
    sense_mode: str = "token"
    gumbel_temperature: float = 0.8
    max_senses: int = 10

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        dict_msg: DictMsg,
        pron_modified: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        word_tokens: Optional[jnp.ndarray] = None,
    ):
        # x: [B, T, H]
        keys, values, key_map, pinyin, pinyin_map = dict_msg
        H = self.query_size
        E = keys.shape[-1]
        q = nn.Dense(H, use_bias=False, name="q", dtype=cdtype())(x)  # [B, T, H]
        # k/v kernels are applied REASSOCIATED on the XLA path: projecting
        # the gathered [B,T,L,E] bank to H costs B*T*L*E*H flops per side,
        # while q->E + an E-length contraction costs B*T*E*H + B*T*L*E —
        # ~2x fewer flops at E=768, H=192, and no [B,T,L,H] intermediates.
        # Exact same math (sum reassociation only); param paths unchanged.
        w_k = _DenseKernel(E, H, name="k")()
        w_v = _DenseKernel(E, H, name="v")()
        # reference parity: scale by key_size^-0.5 (not query size)
        q = q * self.key_size**-0.5

        if keys.ndim == 3:
            # BANK-FUSED path: keys is the UN-gathered [V, L, E] device bank
            # and word_tokens picks rows INSIDE the Pallas kernel — the
            # [B,T,L,E] gathered copy is never materialized (the XLA path
            # writes it once and re-reads it ~4x across fwd+bwd: ~2.8 GB of
            # pure-bandwidth HBM traffic per step at 60x64x96x768). Same
            # math as the XLA branch below; key_map/pinyin* arrive gathered
            # (they are int32 and ~1000x smaller).
            from dicttts_tpu.ops.s2pa_bank_pallas import s2pa_bank_attend

            assert word_tokens is not None, "bank-fused S2PA needs word ids"
            B, T = word_tokens.shape
            L = key_map.shape[-1]
            q_e = jnp.einsum("bth,eh->bte", q, w_k.astype(q.dtype))
            if deterministic:
                mask = jnp.ones((B, T, L), jnp.float32)
            else:
                keep = 1.0 - self.dropout_rate
                mask = (
                    jax.random.bernoulli(
                        self.make_rng("dropout"), keep, (B, T, L)
                    ).astype(jnp.float32) / keep
                )
            ctx_e, weights = s2pa_bank_attend(
                keys, word_tokens.reshape(-1),
                q_e.reshape(B * T, E).astype(keys.dtype),
                key_map.reshape(B * T, L).astype(jnp.int32),
                mask.reshape(B * T, L),
                jax.default_backend() != "tpu",  # interpret off-TPU (CI)
            )
            weights = weights.reshape(B, T, L)
            align = weights
            weights_d = weights * mask  # the kernel's ctx used these
            context = jnp.einsum(
                "bte,eh->bth", ctx_e.reshape(B, T, E).astype(q.dtype),
                w_v.astype(q.dtype))
            if self.sense_mode == "token":
                pron_weights = sense_remap(weights_d, key_map, pinyin_map)
            else:
                rng = (
                    self.make_rng("dropout")
                    if self.sense_mode == "gumbel" and not deterministic
                    else None
                )
                pron_weights = sense_remap_grouped(
                    weights_d, key_map, pinyin_map, self.max_senses,
                    mode=self.sense_mode, temperature=self.gumbel_temperature, rng=rng,
                )
        elif self.use_pallas and deterministic and self.sense_mode == "token":
            from dicttts_tpu.ops.s2pa_pallas import pad_dict_msg, s2pa_fused

            k = jnp.einsum("btle,eh->btlh", keys, w_k)
            v = jnp.einsum("btle,eh->btlh", values, w_v)
            L, P = key_map.shape[-1], pinyin_map.shape[-1]
            k_p, v_p, km_p, _, pm_p = pad_dict_msg(k, v, key_map, pinyin, pinyin_map)
            context, weights, pron_weights = s2pa_fused(q, k_p, v_p, km_p, pm_p)
            weights, pron_weights = weights[..., :L], pron_weights[..., :P]
            align = weights
        else:
            keys = keys.astype(q.dtype)
            values = values.astype(q.dtype)
            q_e = jnp.einsum("bth,eh->bte", q, w_k.astype(q.dtype))  # q in bank space
            logits = jnp.einsum("btle,bte->btl", keys, q_e).astype(jnp.float32)
            logits = jnp.where(key_map != 0, logits, S2PA_MASK_VALUE)
            weights = jax.nn.softmax(logits, axis=-1)  # [B, T, L_k], f32
            align = weights  # attention over gloss tokens, for diagnostics
            weights_d = nn.Dropout(self.dropout_rate)(weights, deterministic=deterministic)
            ctx_e = jnp.einsum("btl,btle->bte", weights_d.astype(values.dtype), values)
            context = jnp.einsum("bte,eh->bth", ctx_e, w_v.astype(ctx_e.dtype))
            if self.sense_mode == "token":
                pron_weights = sense_remap(weights_d, key_map, pinyin_map)
            else:
                # Gumbel noise rides the existing 'dropout' stream so training
                # steps need no extra rng plumbing; eval is noise-free.
                rng = (
                    self.make_rng("dropout")
                    if self.sense_mode == "gumbel" and not deterministic
                    else None
                )
                pron_weights = sense_remap_grouped(
                    weights_d, key_map, pinyin_map, self.max_senses,
                    mode=self.sense_mode, temperature=self.gumbel_temperature, rng=rng,
                )
        context = nn.Dense(H, use_bias=False, name="out", dtype=cdtype())(context)

        # pronunciation head
        pinyin_emb = nn.Embed(
            self.pinyin_vocab, H, embedding_init=nn.initializers.normal(H**-0.5), name="pinyin_embedding",
            dtype=cdtype(),
        )(pinyin) * (pinyin != 0).astype(x.dtype)[..., None]  # padding_idx=0
        if pron_modified is not None:
            pron_weights = apply_pron_rule(pron_weights, pinyin_map, pron_modified)
        pron = jnp.einsum("btp,btph->bth", pron_weights.astype(pinyin_emb.dtype), pinyin_emb)
        return context, align, pron, pron_weights


class S2PATextEncoder(nn.Module):
    """word_emb -> semantic encoder -> S2PA -> (context + pron) ->
    linguistic encoder (reference S2PATextEncoder, dict_encoder.py:69-144).

    The semantic/linguistic encoders are 4-layer transformers WITHOUT a
    relative window (the reference DictEncoder constructs them with
    window_size=None)."""

    word_vocab: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    kernel_size: int
    p_dropout: float
    n_layers: int = 4
    pinyin_vocab: int = 185
    use_pallas: bool = False
    sense_mode: str = "token"
    max_senses: int = 10

    @nn.compact
    def __call__(
        self,
        word_tokens: jnp.ndarray,
        dict_msg: DictMsg,
        pron_modified: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        H = self.hidden_channels
        x = nn.Embed(
            self.word_vocab, H, embedding_init=nn.initializers.normal(H**-0.5), name="word_emb",
            dtype=cdtype(),
        )(word_tokens) * math.sqrt(H)
        x_mask = (word_tokens > 0).astype(x.dtype)[:, :, None]
        x = RelTransformerLayers(
            H, self.filter_channels, self.n_heads, self.n_layers, self.kernel_size,
            self.p_dropout, window_size=None, name="semantic_encoder",
        )(x, x_mask, deterministic)
        context, dict_attn, pron, pron_align = S2PAAttention(
            H, pinyin_vocab=self.pinyin_vocab, dropout_rate=self.p_dropout,
            use_pallas=self.use_pallas, sense_mode=self.sense_mode,
            max_senses=self.max_senses, name="s2pa"
        )(x, dict_msg, pron_modified, deterministic, word_tokens=word_tokens)
        context = context * x_mask
        x = context + pron
        x = RelTransformerLayers(
            H, self.filter_channels, self.n_heads, self.n_layers, self.kernel_size,
            self.p_dropout, window_size=None, name="linguistic_encoder",
        )(x, x_mask, deterministic)
        return x, dict_attn, pron_align, context


class DictEncoder(nn.Module):
    """Masked wrapper (reference DictEncoder, dict_encoder.py:146-171)."""

    word_vocab: int
    hidden_size: int
    num_heads: int = 2
    ffn_kernel_size: int = 5
    dropout: float = 0.0
    pinyin_vocab: int = 185
    use_pallas: bool = False
    sense_mode: str = "token"
    max_senses: int = 10

    @nn.compact
    def __call__(self, word_tokens, dict_msg, pron_modified=None, deterministic: bool = True):
        x, dict_attn, pron_attn, context = S2PATextEncoder(
            self.word_vocab,
            self.hidden_size,
            self.hidden_size * 4,
            self.num_heads,
            self.ffn_kernel_size,
            self.dropout,
            pinyin_vocab=self.pinyin_vocab,
            use_pallas=self.use_pallas,
            sense_mode=self.sense_mode,
            max_senses=self.max_senses,
            name="s2pa_module",
        )(word_tokens, dict_msg, pron_modified, deterministic)
        nonpadding = (word_tokens > 0).astype(x.dtype)[:, :, None]
        return x * nonpadding, dict_attn, pron_attn, context
