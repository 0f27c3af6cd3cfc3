"""Vectorized sequence ops: masks, length regulation, word pooling, duration.

These replace the reference's python-loop hot spots (SURVEY.md §2.11) with
static-shape XLA-friendly primitives:

- `length_regulate`: duration -> mel2token map via cumsum/searchsorted, one
  shot, no per-token python loop (reference LengthRegulator,
  modules/fastspeech/tts_modules.py:198-251 loops+concats per token).
- `group_hidden_by_segs`: segment-mean pooling of phone states into word
  states via one-hot matmul (reference modules/portaspeech/utils.py:3-17
  uses scatter_add).
- `gather_expand`: mel2token gather with the reference's 1-indexed
  pad-row-at-0 convention (modules/dict_tts/model.py:105-107).
- `mel2token_to_dur`: inverse map (modules/fastspeech/tts_modules.py:333-339).

All functions take/return feature-last [B, T, C] arrays and int32 maps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool mask (True inside the sequence)."""
    return jnp.arange(max_len, dtype=lengths.dtype)[None, :] < lengths[:, None]


def length_regulate(
    durations: jnp.ndarray, max_frames: int, nonpadding: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Expand per-token durations into a mel2token index map.

    durations: [B, T] non-negative int32 (pad tokens must carry duration 0).
    Returns mel2token [B, max_frames] int32 where frame f maps to token
    ``t+1`` iff ``cumsum[t-1] <= f < cumsum[t]``; frames beyond the total
    duration are 0 (pad). Matches the reference LengthRegulator semantics
    (1-based token ids, 0 = padding) with a static output length, including
    the all-zero-durations fallback (fill real tokens with duration 1,
    reference tts_modules.py:240-243) when ``nonpadding`` is given.
    """
    if nonpadding is not None:
        all_zero = jnp.sum(durations, axis=-1, keepdims=True) == 0
        durations = jnp.where(all_zero, nonpadding.astype(durations.dtype), durations)
    csum = jnp.cumsum(durations, axis=-1)  # [B, T]
    frames = jnp.arange(max_frames, dtype=csum.dtype)[None, :]  # [1, F]
    # token index for each frame = #cumsum entries <= frame
    mel2token = jnp.sum(frames[:, :, None] >= csum[:, None, :], axis=-1) + 1  # [B, F]
    total = csum[:, -1:]
    return jnp.where(frames < total, mel2token, 0).astype(jnp.int32)


def gather_expand(x: jnp.ndarray, mel2token: jnp.ndarray) -> jnp.ndarray:
    """Gather token states to frames: x [B, T, C], mel2token [B, F] 1-based
    with 0=pad -> [B, F, C] (pad frames read a zero row)."""
    x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
    return jnp.take_along_axis(x, mel2token[:, :, None], axis=1)


def group_hidden_by_segs(
    h: jnp.ndarray, seg_ids: jnp.ndarray, max_len: int
) -> jnp.ndarray:
    """Mean-pool hidden states into segments.

    h: [B, T, C]; seg_ids: [B, T] 1-based segment ids (0 = pad).
    Returns [B, max_len, C] of per-segment means (empty segments are zero).
    Implemented as a one-hot matmul — a single MXU-friendly contraction.
    """
    onehot = (seg_ids[:, :, None] == (1 + jnp.arange(max_len))[None, None, :]).astype(h.dtype)
    summed = jnp.einsum("btc,bts->bsc", h, onehot)
    counts = jnp.sum(onehot, axis=1)[:, :, None]
    return summed / jnp.maximum(counts, 1.0)


def scatter_sum_by_segs(values: jnp.ndarray, seg_ids: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Sum [B, T] values into [B, max_len] segments (1-based ids, 0 dropped).
    Used to pool phone-level durations to word level (reference
    modules/portaspeech/model.py:314-317 scatter_add)."""
    onehot = (seg_ids[:, :, None] == (1 + jnp.arange(max_len))[None, None, :]).astype(values.dtype)
    return jnp.einsum("bt,bts->bs", values, onehot)


def mel2token_to_dur(mel2token: jnp.ndarray, max_tokens: int) -> jnp.ndarray:
    """Invert a mel2token map into per-token durations [B, max_tokens]."""
    onehot = (mel2token[:, :, None] == (1 + jnp.arange(max_tokens))[None, None, :])
    return jnp.sum(onehot, axis=1).astype(jnp.int32)


def build_word_mask(x2word: jnp.ndarray, y2word: jnp.ndarray) -> jnp.ndarray:
    """[B, Tx], [B, Ty] -> [B, Tx, Ty] 1 where same word id (reference
    PortaSpeech.build_word_mask, modules/portaspeech/model.py:366)."""
    return (x2word[:, :, None] == y2word[:, None, :]).astype(jnp.int32)


def intra_word_positions(word2word: jnp.ndarray, x2word: jnp.ndarray) -> jnp.ndarray:
    """Fractional position of each element within its word, in (0, 1].

    Reference PortaSpeech.build_pos_embed (modules/portaspeech/model.py:358-
    363): for each word, elements get cumsum/len within the word; elements
    outside any word get 0. Input word2word is [B, T_word] = arange+1.
    """
    mask = build_word_mask(word2word, x2word).astype(jnp.float32)  # [B, W, T]
    cums = jnp.cumsum(mask, axis=-1)
    denom = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    return jnp.sum(cums / denom * mask, axis=1)  # [B, T]


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pad_frames_multiple(mel2token: jnp.ndarray, frames_multiple: int) -> jnp.ndarray:
    """Static-shape analog of the reference's frames_multiple padding
    (modules/dict_tts/model.py:98-100): here max_frames is already a
    multiple, so this is only used to extend the last nonzero entry when a
    sequence's total length is not a multiple of ``frames_multiple``."""
    if frames_multiple <= 1:
        return mel2token
    lengths = jnp.sum((mel2token > 0).astype(jnp.int32), axis=-1)  # [B]
    padded_len = ((lengths + frames_multiple - 1) // frames_multiple) * frames_multiple
    padded_len = jnp.minimum(padded_len, mel2token.shape[1])
    frames = jnp.arange(mel2token.shape[1], dtype=jnp.int32)[None, :]
    last = jnp.take_along_axis(
        mel2token, jnp.maximum(lengths - 1, 0)[:, None], axis=1
    )  # [B, 1] last real token id
    extend = (frames >= lengths[:, None]) & (frames < padded_len[:, None])
    return jnp.where(extend, last, mel2token)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over positions where mask is nonzero (mask broadcasts to x)."""
    mask = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)
