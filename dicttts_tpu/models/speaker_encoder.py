"""GE2E speaker encoder (Resemblyzer VoiceEncoder architecture) + GE2E loss.

The reference extracts per-utterance speaker embeddings with Resemblyzer's
pretrained GE2E voice encoder
(/root/reference/data_gen/tts/base_binarizer.py:156-157,167). That package
(and its checkpoint) is absent in this image, so this module provides the
SAME architecture natively in flax — 3-layer LSTM(40 -> 256) over mel
frames, Dense(256) + ReLU on the final hidden state, L2 normalize — plus:

- `convert_resemblyzer_state`: exact weight mapping from the torch
  ``VoiceEncoder`` state_dict (``lstm.weight_ih_l{k}`` / ``weight_hh_l{k}``
  / ``bias_ih_l{k}`` / ``bias_hh_l{k}``, ``linear.weight/bias``) so a
  locally available Resemblyzer checkpoint drops straight in
  (tests/test_speaker_encoder.py proves forward parity against torch);
- `ge2e_loss`: the Wan et al. GE2E softmax loss (own-speaker centroid
  excludes the utterance itself), so the framework can TRAIN a speaker
  encoder from scratch on a multi-speaker corpus instead of depending on
  an external pretrained model;
- `embed_utterance`: Resemblyzer-style partial-window inference (slide
  fixed 160-frame windows, average the partial embeddings, renormalize) —
  static shapes per window count, TPU-friendly.

torch LSTM gate order is (i, f, g, o) with two biases; flax LSTMCell sums
input and recurrent paths with a single bias on the recurrent Dense — the
converter folds ``b_ih + b_hh`` into that bias.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MEL_N_CHANNELS = 40  # Resemblyzer's mel front-end
PARTIAL_N_FRAMES = 160


class GE2ESpeakerEncoder(nn.Module):
    n_layers: int = 3
    hidden_size: int = 256
    embed_size: int = 256

    @nn.compact
    def __call__(self, mels: jnp.ndarray) -> jnp.ndarray:
        """mels [B, T, 40] -> l2-normalized embeddings [B, embed_size]."""
        x = mels
        final_h = None
        for k in range(self.n_layers):
            cell = nn.LSTMCell(self.hidden_size, name=f"lstm_{k}")
            B = x.shape[0]
            carry = cell.initialize_carry(jax.random.PRNGKey(0), (B, x.shape[-1]))
            (c, h), x = nn.RNN(cell, name=f"rnn_{k}")(
                x, initial_carry=carry, return_carry=True
            )
            final_h = h
        e = nn.relu(nn.Dense(self.embed_size, name="proj")(final_h))
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-5)


def embed_utterance(
    params, mel: np.ndarray, partial_frames: int = PARTIAL_N_FRAMES, overlap: float = 0.5
) -> np.ndarray:
    """Resemblyzer embed_utterance: batch the sliding partial windows
    through ONE forward, average, renormalize. mel: [T, 40] numpy.
    Model dims are inferred from the param tree."""
    model = GE2ESpeakerEncoder(
        n_layers=sum(1 for k in params if k.startswith("lstm_")),
        hidden_size=params["proj"]["kernel"].shape[0],
        embed_size=params["proj"]["kernel"].shape[1],
    )
    T = len(mel)
    hop = max(int(partial_frames * (1 - overlap)), 1)
    if T < partial_frames:
        mel = np.pad(mel, ((0, partial_frames - T), (0, 0)))
        T = partial_frames
    starts = list(range(0, T - partial_frames + 1, hop))
    if starts[-1] + partial_frames < T:
        starts.append(T - partial_frames)
    windows = np.stack([mel[s : s + partial_frames] for s in starts])
    partials = model.apply({"params": params}, jnp.asarray(windows, jnp.float32))
    e = np.asarray(partials).mean(0)
    n = np.linalg.norm(e)
    return (e / n if n > 0 else e).astype(np.float32)


def ge2e_loss(embeds: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """GE2E softmax loss. embeds: [n_spk, n_utt, D] (l2-normalized);
    w, b: learned scalar scale (w clamped positive) and bias.

    sim[j,i,k] = w * cos(e_ji, c_k) + b, where c_j (own speaker) excludes
    utterance i from the centroid (Wan et al. 2018, eq. 8-9)."""
    S, U, D = embeds.shape
    centroids = jnp.mean(embeds, axis=1)  # [S, D]
    # exclusive centroids: (sum - e_ji) / (U - 1)
    excl = (jnp.sum(embeds, axis=1, keepdims=True) - embeds) / jnp.maximum(U - 1, 1)
    excl = excl / jnp.maximum(jnp.linalg.norm(excl, axis=-1, keepdims=True), 1e-5)
    cnorm = centroids / jnp.maximum(jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-5)
    sim = jnp.einsum("jud,kd->juk", embeds, cnorm)  # [S, U, S]
    own = jnp.einsum("jud,jud->ju", embeds, excl)  # exclusive own-speaker sim
    eye = jnp.eye(S)[:, None, :]
    sim = sim * (1 - eye) + own[:, :, None] * eye
    w = jnp.maximum(w, 1e-6)
    logits = w * sim + b
    labels = jnp.tile(jnp.arange(S)[:, None], (1, U))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, :, None], axis=-1))


def convert_resemblyzer_state(state_dict, n_layers: int = 3) -> dict:
    """torch VoiceEncoder state_dict -> flax params for GE2ESpeakerEncoder."""

    def t(x):
        return np.ascontiguousarray(np.asarray(x, np.float32).T)

    params: dict = {}
    for k in range(n_layers):
        w_ih = np.asarray(state_dict[f"lstm.weight_ih_l{k}"], np.float32)  # [4H, in]
        w_hh = np.asarray(state_dict[f"lstm.weight_hh_l{k}"], np.float32)  # [4H, H]
        bias = np.asarray(state_dict[f"lstm.bias_ih_l{k}"], np.float32) + np.asarray(
            state_dict[f"lstm.bias_hh_l{k}"], np.float32
        )
        H = w_hh.shape[1]
        gates = ["i", "f", "g", "o"]
        cell: dict = {}
        for gi, gate in enumerate(gates):
            sl = slice(gi * H, (gi + 1) * H)
            cell[f"i{gate}"] = {"kernel": t(w_ih[sl])}
            cell[f"h{gate}"] = {"kernel": t(w_hh[sl]), "bias": bias[sl]}
        params[f"lstm_{k}"] = cell
    params["proj"] = {
        "kernel": t(state_dict["linear.weight"]),
        "bias": np.asarray(state_dict["linear.bias"], np.float32),
    }
    return params


def ge2e_embed(mel: np.ndarray, ckpt_path: str) -> Optional[np.ndarray]:
    """Load a Resemblyzer-format checkpoint (torch .pt with 'model_state')
    and embed one utterance; returns None if torch/ckpt unavailable."""
    try:
        import torch

        payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = payload.get("model_state", payload)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        params = convert_resemblyzer_state(sd)
    except Exception:
        return None
    return embed_utterance(params, mel)
