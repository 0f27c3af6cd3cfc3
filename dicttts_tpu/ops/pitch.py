"""Pitch utilities: coarse f0 bucketing and normalization.

Capability parity with /root/reference/utils/pitch_utils.py:130-180:
- `f0_to_coarse`: mel-scale (1127 ln(1+f/700)) bucketing into 256 bins over
  [50, 1100] Hz; 0 stays bucket 1's floor semantics (unvoiced -> 1);
- `norm_f0`/`denorm_f0`: 'log' (log2) or 'standard' ((f0-mean)/std) with
  unvoiced masking;
- `norm_interp_f0` (host-side numpy): interpolate f0 through unvoiced gaps
  and return (normalized f0, uv mask) — dataset-time preprocessing
  (tasks/tts/dataset_utils.py FastSpeechDataset).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F0_BIN = 256
F0_MIN, F0_MAX = 50.0, 1100.0
F0_MEL_MIN = 1127.0 * np.log(1 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * np.log(1 + F0_MAX / 700.0)


def f0_to_coarse(f0):
    xp = jnp if isinstance(f0, jnp.ndarray) else np
    f0_mel = 1127.0 * xp.log(1 + f0 / 700.0)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1
    scaled = xp.where(f0_mel > 0, scaled, 0.0)
    scaled = xp.clip(scaled, 1.0, F0_BIN - 1)
    return (scaled + 0.5).astype(xp.int32)


def norm_f0(f0, uv=None, pitch_norm: str = "log", mean: float = 0.0, std: float = 1.0):
    xp = jnp if isinstance(f0, jnp.ndarray) else np
    if pitch_norm == "standard":
        out = (f0 - mean) / std
    elif pitch_norm == "log":
        out = xp.log2(xp.maximum(f0, 1e-8))
    else:
        out = f0
    if uv is not None:
        out = out * (1 - uv)
    return out


def denorm_f0(f0, uv=None, pitch_norm: str = "log", mean: float = 0.0, std: float = 1.0, pitch_padding=None):
    xp = jnp if isinstance(f0, jnp.ndarray) else np
    if pitch_norm == "standard":
        out = f0 * std + mean
    elif pitch_norm == "log":
        out = 2.0**f0
    else:
        out = f0
    out = xp.maximum(out, 0.0)
    if uv is not None:
        out = out * (1 - uv)
    if pitch_padding is not None:
        out = xp.where(pitch_padding, 0.0, out)
    return out


def norm_interp_f0(f0: np.ndarray, pitch_norm: str = "log", mean: float = 0.0, std: float = 1.0):
    """Host-side: uv mask + linear interpolation through unvoiced regions,
    then normalize. Returns (f0_norm, uv) float32 arrays."""
    f0 = np.asarray(f0, np.float32)
    uv = (f0 == 0).astype(np.float32)
    if (uv < 1).any():
        voiced = np.where(uv < 1)[0]
        f0 = np.interp(np.arange(len(f0)), voiced, f0[voiced])
    f0 = norm_f0(f0, None, pitch_norm, mean, std)
    return f0.astype(np.float32), uv
