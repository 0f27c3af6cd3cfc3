"""TransformerTTS — autoregressive seq2seq acoustic model (legacy family).

Capability parity with the reference
/root/reference/modules/fastspeech/transformer_tts.py (TransformerEncoder
:9-76, TransformerDecoder :78-208, TransformerTTS :210-407) and the
DecSALayer / TransformerFFNLayer primitives
(modules/commons/common_layers.py:541-581,676-760), redesigned TPU-first:

- Training is the teacher-forced FULL-SEQUENCE pass (causal mask) — one
  MXU-friendly batched graph, no step loop (the reference shares this path).
- Inference replaces the reference's python ``while True`` incremental-state
  loop (transformer_tts.py:310-404) with a ``lax.scan`` over a STATIC
  ``max_decode_len``: per-layer self-attention K/V caches and the causal
  conv-FFN window buffer live in the scan carry, cross-attention K/V are
  projected once. EOS is tracked in-scan via the stop head; frames after the
  first EOS are masked in the returned ``out_mask`` (no dynamic early exit —
  static shapes are the TPU contract).
- The two-stage ``attn_constraint`` beam hack (:335-399) is host-driven
  dead-config machinery (off in every shipped recipe) and is intentionally
  not reproduced.
- Only the prenet keeps dropout at inference (the reference runs it with
  ``training=True`` unconditionally, :118-123) — the scan path hand-rolls it
  from a folded key so every decode step draws fresh noise.

Layout: feature-last [B, T, C] (the reference is fairseq T×B×C).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.fft_blocks import FFTBlocks, sinusoidal_positions
from dicttts_tpu.models.layers import LayerNorm

NEG_INF = -1e9


class MHA(nn.Module):
    """Plain multi-head attention with separate no-bias projections
    (reference fairseq MultiheadAttention(bias=False))."""

    hidden_size: int
    num_heads: int

    def setup(self):
        self.q_proj = nn.Dense(self.hidden_size, use_bias=False)
        self.k_proj = nn.Dense(self.hidden_size, use_bias=False)
        self.v_proj = nn.Dense(self.hidden_size, use_bias=False)
        self.out_proj = nn.Dense(self.hidden_size, use_bias=False)

    def _split(self, x):
        B, T, H = x.shape
        return x.reshape(B, T, self.num_heads, H // self.num_heads)

    def __call__(self, q_in, kv_in, mask: Optional[jnp.ndarray] = None):
        """q_in [B,Tq,H], kv_in [B,Tk,H]; mask broadcastable to
        [B, heads, Tq, Tk] (True = attend). Returns (out, weights)."""
        hd = self.hidden_size // self.num_heads
        q = self._split(self.q_proj(q_in)) * hd**-0.5
        k = self._split(self.k_proj(kv_in))
        v = self._split(self.v_proj(kv_in))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        return self.out_proj(out.reshape(q_in.shape[0], q_in.shape[1], self.hidden_size)), w

    def step(self, q_t, k_cache, v_cache, valid):
        """One decode step: q_t [B,H] against caches [B,T,H]; valid [T] bool."""
        B = q_t.shape[0]
        hd = self.hidden_size // self.num_heads
        q = self.q_proj(q_t[:, None]).reshape(B, self.num_heads, hd) * hd**-0.5
        k = k_cache.reshape(B, -1, self.num_heads, hd)
        v = v_cache.reshape(B, -1, self.num_heads, hd)
        logits = jnp.einsum("bhd,bkhd->bhk", q, k)
        logits = jnp.where(valid[None, None, :], logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhk,bkhd->bhd", w, v).reshape(B, self.hidden_size)
        return self.out_proj(out[:, None])[:, 0], w


class TransformerTTSDecoderLayer(nn.Module):
    """DecSALayer: pre-LN causal self-attn -> cross-attn -> causal conv FFN
    (common_layers.py:676-760)."""

    hidden_size: int
    num_heads: int = 2
    kernel_size: int = 9
    dropout: float = 0.1

    def setup(self):
        H = self.hidden_size
        self.ln1, self.ln2, self.ln3 = LayerNorm(), LayerNorm(), LayerNorm()
        self.self_attn = MHA(H, self.num_heads)
        self.cross_attn = MHA(H, self.num_heads)
        # TransformerFFNLayer, padding='LEFT': causal conv -> *k^-0.5 -> gelu
        # -> dropout -> linear (common_layers.py:541-581)
        self.ffn_conv = nn.Conv(4 * H, (self.kernel_size,), padding="VALID")
        self.ffn_out = nn.Dense(H)
        self.drop = nn.Dropout(self.dropout)

    def _ffn(self, h, deterministic):
        f = self.ffn_conv(h) * self.kernel_size**-0.5
        f = nn.gelu(f)
        f = self.drop(f, deterministic=deterministic)
        return self.ffn_out(f)

    def __call__(self, x, enc, causal_mask, enc_mask, deterministic: bool = True):
        h = self.ln1(x)
        h, _ = self.self_attn(h, h, causal_mask)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.ln2(x)
        h, attn_w = self.cross_attn(h, enc, enc_mask)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.ln3(x)
        h = jnp.pad(h, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        x = x + self.drop(self._ffn(h, deterministic), deterministic=deterministic)
        return x, attn_w

    def project_cross_kv(self, enc):
        return self.cross_attn.k_proj(enc), self.cross_attn.v_proj(enc)

    def step(self, x_t, enc_kv, enc_mask, cache, idx):
        """x_t [B,H]; cache = (k_cache, v_cache [B,Tmax,H], ffn_buf
        [B,k-1,H]); idx = current decode position (traced scalar)."""
        k_cache, v_cache, ffn_buf = cache
        h = self.ln1(x_t[:, None])[:, 0]
        k_cache = k_cache.at[:, idx].set(self.self_attn.k_proj(h[:, None])[:, 0])
        v_cache = v_cache.at[:, idx].set(self.self_attn.v_proj(h[:, None])[:, 0])
        valid = jnp.arange(k_cache.shape[1]) <= idx
        a, _ = self.self_attn.step(h, k_cache, v_cache, valid)  # q already LN'd
        # NB self_attn.step re-projects q from h; k/v written above are the
        # projections of the SAME h, so cache and q stay consistent.
        x_t = x_t + a
        h = self.ln2(x_t[:, None])
        enc_k, enc_v = enc_kv
        hd = self.hidden_size // self.num_heads
        B = x_t.shape[0]
        q = self.cross_attn.q_proj(h).reshape(B, self.num_heads, hd) * hd**-0.5
        logits = jnp.einsum(
            "bhd,bkhd->bhk", q, enc_k.reshape(B, -1, self.num_heads, hd)
        )
        logits = jnp.where(enc_mask[:, None, :], logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        a = jnp.einsum("bhk,bkhd->bhd", w, enc_v.reshape(B, -1, self.num_heads, hd))
        a = self.cross_attn.out_proj(a.reshape(B, self.hidden_size)[:, None])[:, 0]
        x_t = x_t + a
        h = self.ln3(x_t[:, None])[:, 0]
        window = jnp.concatenate([ffn_buf, h[:, None]], axis=1)  # [B, k, H]
        f = self._ffn(window, deterministic=True)[:, -1]
        x_t = x_t + f
        return x_t, (k_cache, v_cache, window[:, 1:]), w


class TransformerTTS(nn.Module):
    """AR encoder-decoder TTS with a stop-token head (mel_bins + 1 outputs)."""

    vocab_size: int
    hidden_size: int = 256
    enc_layers: int = 4
    dec_layers: int = 4
    num_heads: int = 2
    enc_ffn_kernel_size: int = 9
    dec_ffn_kernel_size: int = 9
    prenet_hidden_size: int = 256
    prenet_dropout: float = 0.5
    mel_bins: int = 80
    dropout: float = 0.1
    mel_vmin: float = -6.0
    num_spk: int = 0

    def setup(self):
        H = self.hidden_size
        self.embed = nn.Embed(self.vocab_size, H, embedding_init=nn.initializers.normal(H**-0.5))
        self.encoder = FFTBlocks(
            H, self.enc_layers, self.enc_ffn_kernel_size, self.num_heads, self.dropout
        )
        self.prenet_fc1 = nn.Dense(self.prenet_hidden_size)
        self.prenet_fc2 = nn.Dense(self.prenet_hidden_size)
        self.prenet_fc3 = nn.Dense(H, use_bias=False)
        self.dec_layers_mods = [
            TransformerTTSDecoderLayer(
                H, self.num_heads, self.dec_ffn_kernel_size, self.dropout,
                name=f"dec_layer_{i}",
            )
            for i in range(self.dec_layers)
        ]
        self.dec_ln = LayerNorm()
        self.project_out = nn.Dense(self.mel_bins + 1, use_bias=False)
        self.prenet_drop = nn.Dropout(self.prenet_dropout)
        self.pos_drop = nn.Dropout(self.dropout)
        self.dec_alpha = self.param("dec_pos_alpha", nn.initializers.ones, (1,))
        if self.num_spk > 0:
            self.spk_embed = nn.Embed(self.num_spk, H)

    # -- shared pieces --------------------------------------------------------

    def _prenet(self, x, rng=None, deterministic_mask=None):
        """3-FC prenet; dropout ALWAYS on (transformer_tts.py:111-126).

        In the parallel path flax's Dropout supplies noise (rng=None); the
        scan path passes an explicit folded key."""
        mask = (jnp.sum(jnp.abs(x), -1, keepdims=True) != 0).astype(x.dtype)
        if deterministic_mask is not None:
            mask = deterministic_mask

        def drop(h, key):
            if key is None:
                return self.prenet_drop(h, deterministic=False)
            keep = jax.random.bernoulli(key, 1.0 - self.prenet_dropout, h.shape)
            return jnp.where(keep, h / (1.0 - self.prenet_dropout), 0.0)

        k1, k2 = (None, None) if rng is None else jax.random.split(rng)
        h = drop(nn.relu(self.prenet_fc1(x)), k1)
        h = drop(nn.relu(self.prenet_fc2(h)), k2)
        return nn.relu(self.prenet_fc3(h)) * mask

    def encode(self, txt_tokens, spk_ids=None, deterministic: bool = True):
        nonpadding = (txt_tokens > 0).astype(jnp.float32)
        x = self.embed(txt_tokens) * math.sqrt(self.hidden_size)
        enc = self.encoder(x, nonpadding, deterministic)
        if self.num_spk > 0 and spk_ids is not None:
            enc = enc + self.spk_embed(spk_ids)[:, None, :]
        return enc, nonpadding

    # -- teacher-forced training pass -----------------------------------------

    def __call__(
        self,
        txt_tokens: jnp.ndarray,  # [B, T_txt]
        tgt_mels: jnp.ndarray,  # [B, T_mel, mel_bins]
        spk_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> dict:
        enc, src_nonpad = self.encode(txt_tokens, spk_ids, deterministic)
        prev = jnp.pad(
            tgt_mels[:, :-1], ((0, 0), (1, 0), (0, 0)), constant_values=self.mel_vmin
        )
        tgt_nonpad = (jnp.sum(jnp.abs(tgt_mels), -1) != 0).astype(jnp.float32)
        T = prev.shape[1]
        x = self._prenet(prev)
        pos = jnp.asarray(sinusoidal_positions(T, self.hidden_size))
        x = x + self.dec_alpha * pos[None] * tgt_nonpad[:, :, None]
        x = self.pos_drop(x, deterministic=deterministic)
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        causal = causal & (tgt_nonpad[:, None, None, :] > 0)
        enc_mask = (src_nonpad[:, None, None, :] > 0)
        attn_ws = []
        for layer in self.dec_layers_mods:
            x, w = layer(x, enc, causal, enc_mask, deterministic)
            attn_ws.append(w)
        x = self.dec_ln(x)
        y = self.project_out(x)
        return {
            "mel_out": y[..., : self.mel_bins],
            "stop_logits": y[..., -1],
            "attn": attn_ws,
        }

    # -- scan decode -----------------------------------------------------------

    def infer(
        self,
        txt_tokens: jnp.ndarray,
        max_decode_len: int,
        spk_ids: Optional[jnp.ndarray] = None,
        prenet_rng: Optional[jax.Array] = None,
    ) -> dict:
        """AR decode over a static max_decode_len (the reference's
        estimate_decode_length = T_txt*8+100 is a sensible choice)."""
        B = txt_tokens.shape[0]
        H, M = self.hidden_size, self.mel_bins
        enc, src_nonpad = self.encode(txt_tokens, spk_ids, deterministic=True)
        enc_mask = src_nonpad > 0
        enc_kvs = [layer.project_cross_kv(enc) for layer in self.dec_layers_mods]
        pos_table = jnp.asarray(sinusoidal_positions(max_decode_len, H))
        if prenet_rng is None:
            prenet_rng = self.make_rng("sample")
        k = self.dec_ffn_kernel_size

        def init_cache():
            return tuple(
                (
                    jnp.zeros((B, max_decode_len, H)),
                    jnp.zeros((B, max_decode_len, H)),
                    jnp.zeros((B, k - 1, H)),
                )
                for _ in range(self.dec_layers)
            )

        def body(carry, idx):
            prev_mel, hit_eos, caches = carry
            x_t = self._prenet(
                prev_mel[:, None],
                rng=jax.random.fold_in(prenet_rng, idx),
                deterministic_mask=jnp.ones((B, 1, 1)),
            )[:, 0]
            x_t = x_t + self.dec_alpha * pos_table[idx]
            new_caches = []
            for layer, enc_kv, cache in zip(self.dec_layers_mods, enc_kvs, caches):
                x_t, cache, _ = layer.step(x_t, enc_kv, enc_mask, cache, idx)
                new_caches.append(cache)
            y = self.project_out(self.dec_ln(x_t[:, None])[:, 0])
            mel_t, stop_t = y[:, :M], y[:, M]
            hit_eos = hit_eos | (jax.nn.sigmoid(stop_t) > 0.5)
            return (mel_t, hit_eos, tuple(new_caches)), (mel_t, stop_t, hit_eos)

        init = (jnp.full((B, M), self.mel_vmin), jnp.zeros((B,), bool), init_cache())
        _, (mels, stops, eos_trace) = jax.lax.scan(body, init, jnp.arange(max_decode_len))
        mels = jnp.swapaxes(mels, 0, 1)  # [B, T, M]
        stops = jnp.swapaxes(stops, 0, 1)
        eos_trace = jnp.swapaxes(eos_trace, 0, 1)  # True from the first EOS on
        out_mask = ~eos_trace  # frames strictly before the first stop
        return {
            "mel_out": mels * out_mask[:, :, None],
            "mel_raw": mels,  # unmasked, for parity tests/diagnostics
            "stop_logits": stops,
            "out_mask": out_mask.astype(jnp.float32),
        }

    @staticmethod
    def estimate_decode_length(input_length: int) -> int:
        return input_length * 8 + 100  # transformer_tts.py:406-407
