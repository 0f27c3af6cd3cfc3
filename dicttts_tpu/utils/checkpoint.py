"""Checkpoint save/rotate/best/resume.

Capability parity with the reference checkpoint machinery
(/root/reference/utils/trainer.py:410-449 and utils/ckpt_utils.py:8-69):
- files named ``model_ckpt_steps_<N>.ckpt`` in the work dir; newest-by-step
  globbing; rotation keeps the newest ``keep`` checkpoints;
- best tracking by a monitored validation metric writes
  ``model_ckpt_best.ckpt``;
- atomic writes via a ``.part`` temp file + os.replace;
- non-strict load that drops shape-mismatched leaves (fine-tune partial
  load, ckpt_utils.load_ckpt strict=False).

Serialization is flax msgpack over the full train-state pytree — the
JAX-native analog of the torch pickle dict.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any

import numpy as np
from flax import serialization, traverse_util


def _ckpt_step(path: str) -> int:
    m = re.search(r"model_ckpt_steps_(\d+)\.ckpt", os.path.basename(path))
    return int(m.group(1)) if m else -1


def get_all_ckpts(work_dir: str) -> list[str]:
    """All step checkpoints, newest first."""
    paths = glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt"))
    return sorted(paths, key=_ckpt_step, reverse=True)


def get_last_checkpoint(work_dir: str) -> str | None:
    ckpts = get_all_ckpts(work_dir)
    return ckpts[0] if ckpts else None


def save_checkpoint(
    work_dir: str,
    step: int,
    state: Any,
    keep: int = 3,
    is_best: bool = False,
    extra: dict | None = None,
) -> str:
    """Atomically write the train state; rotate old step checkpoints."""
    os.makedirs(work_dir, exist_ok=True)
    payload = {"global_step": step, "state": state}
    if extra:
        payload.update(extra)
    data = serialization.to_bytes(payload)
    path = os.path.join(work_dir, f"model_ckpt_steps_{step}.ckpt")
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    if is_best:
        best = os.path.join(work_dir, "model_ckpt_best.ckpt")
        with open(best + ".part", "wb") as f:
            f.write(data)
        os.replace(best + ".part", best)
    for old in get_all_ckpts(work_dir)[keep:]:
        os.remove(old)
    return path


def restore_checkpoint(path: str, target_state: Any) -> tuple[int, Any]:
    """Load a checkpoint into the structure of ``target_state``.

    Returns (global_step, state). Raises on structural mismatch — use
    `load_partial` for tolerant fine-tune loads.
    """
    with open(path, "rb") as f:
        payload = serialization.from_bytes({"global_step": 0, "state": target_state}, f.read())
    return int(payload["global_step"]), payload["state"]


def read_extras(path: str) -> dict:
    """Read the scalar extras (e.g. ``best_val``) stored alongside the state
    without deserializing the state tree (reference restores
    checkpoint_callback_best on resume, utils/trainer.py:372-377)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return {k: v for k, v in raw.items() if k not in ("global_step", "state")}


def load_partial(path: str, target_params: Any, subtree: str | None = "params_g") -> tuple[Any, list[str]]:
    """Shape-tolerant parameter load: leaves whose shapes mismatch (or are
    missing) keep the target's values; returns (params, skipped_keys).

    ``subtree``: key path (e.g. "params_g") selecting the parameter tree
    inside the checkpointed state; pass None if ``target_params`` mirrors
    the whole state."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    src = raw.get("state", raw)
    if subtree:
        for part in subtree.split("/"):
            if isinstance(src, dict) and part in src:
                src = src[part]
    flat_tgt = traverse_util.flatten_dict(serialization.to_state_dict(target_params))
    flat_src = traverse_util.flatten_dict(src) if isinstance(src, dict) else {}
    skipped = []
    out = {}
    for key, tgt_val in flat_tgt.items():
        src_val = flat_src.get(key)
        if src_val is not None and np.shape(src_val) == np.shape(tgt_val):
            out[key] = np.asarray(src_val)
        else:
            out[key] = tgt_val
            skipped.append("/".join(map(str, key)))
    restored = traverse_util.unflatten_dict(out)
    return serialization.from_state_dict(target_params, restored), skipped
