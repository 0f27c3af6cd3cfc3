"""Attention-health diagnostics for encoder-decoder alignments.

Capability parity with /root/reference/utils/tts_utils.py:73-145 (used by
ps_flow validation, tasks/tts/ps_flow.py:141-157): focus rate (mean max
attention per output step), phone coverage (fraction of inputs receiving
attention mass above a threshold), and diagonal focus rate (mass inside a
band around the ideal monotonic diagonal)."""

from __future__ import annotations

import numpy as np


def focus_rate(attn: np.ndarray, out_mask: np.ndarray | None = None) -> float:
    """attn: [T_out, T_in]; mean over output steps of max input weight."""
    peak = attn.max(-1)
    if out_mask is not None:
        peak = peak[out_mask.astype(bool)]
    return float(peak.mean()) if peak.size else 0.0


def phone_coverage_rate(attn: np.ndarray, in_mask: np.ndarray | None = None, threshold: float = 0.1) -> float:
    """Fraction of input tokens whose max received attention > threshold."""
    received = attn.max(0)
    if in_mask is not None:
        received = received[in_mask.astype(bool)]
    return float((received > threshold).mean()) if received.size else 0.0


def diagonal_focus_rate(
    attn: np.ndarray, band_width_ratio: float = 0.2
) -> float:
    """Attention mass within a band around the monotonic diagonal."""
    T_out, T_in = attn.shape
    rows = np.arange(T_out)[:, None] / max(T_out - 1, 1)
    cols = np.arange(T_in)[None, :] / max(T_in - 1, 1)
    band = np.abs(rows - cols) <= band_width_ratio
    total = attn.sum()
    return float((attn * band).sum() / total) if total > 0 else 0.0


def attention_metrics(attn: np.ndarray, in_len: int | None = None, out_len: int | None = None) -> dict:
    if out_len:
        attn = attn[:out_len]
    if in_len:
        attn = attn[:, :in_len]
    return {
        "fr": focus_rate(attn),
        "pcr": phone_coverage_rate(attn),
        "dfr": diagonal_focus_rate(attn),
    }
