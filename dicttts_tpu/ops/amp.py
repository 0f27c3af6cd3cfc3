"""Activation-dtype threading for mixed-precision training (true bf16 amp).

The original `amp` flag only set `jax.default_matmul_precision("bfloat16")`:
MXU multiplies ran bf16 but every activation stayed float32 in HBM, so
elementwise chains (gated units, masks, residuals) paid 2x the memory
bandwidth and every matmul re-cast its inputs. This module provides the
TPU-standard recipe instead: parameters and optimizer state stay f32,
activations flow bf16 through the hot modules, and numerically sensitive
islands (flow log-dets, KL, softmax statistics, losses) compute in f32.

Mechanism: a contextvar read at TRACE time. Modules construct their flax
layers with ``dtype=cdtype()``; the task enters ``compute_dtype(bf16)``
around the traced model call when ``amp_bf16_activations`` is on (default:
follows ``amp``). With the context unset, ``cdtype()`` is None and every
module behaves exactly as before (f32 in -> f32 compute) — parity tests run
in that mode. Shielded modules (flows, post-glow) re-enter
``compute_dtype(None)`` internally regardless of the outer context.

The reference has no TPU equivalent; its amp is torch.cuda.amp autocast
(/root/reference/utils/trainer.py:61,316-323), which this supersedes with
explicit dtype islands.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

_COMPUTE_DTYPE: contextvars.ContextVar = contextvars.ContextVar(
    "dicttts_compute_dtype", default=None
)


def cdtype():
    """Computation dtype for flax layers (None = flax default: promote to
    f32 with f32 params). Read at trace time inside module __call__."""
    return _COMPUTE_DTYPE.get()


@contextlib.contextmanager
def compute_dtype(dt):
    """Set the activation compute dtype for the enclosed trace. Pass None
    to shield a numerically sensitive sub-graph back to full precision."""
    tok = _COMPUTE_DTYPE.set(dt)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.reset(tok)


def task_activation_dtype(cfg: dict):
    """The activation dtype a task should trace its model with:
    bf16 when amp_bf16_activations (default: the amp flag), else None."""
    if cfg.get("amp_bf16_activations", bool(cfg.get("amp"))):
        return jnp.bfloat16
    return None


def amp_scope(matmul_precision, act_dtype):
    """Trace-time scope combining the bf16 matmul policy and the bf16
    activation dtype (both no-ops when None)."""
    import jax

    scope = contextlib.ExitStack()
    if matmul_precision:
        scope.enter_context(jax.default_matmul_precision(matmul_precision))
    if act_dtype is not None:
        scope.enter_context(compute_dtype(act_dtype))
    return scope


def cast_params(params, dtype):
    """Param-cast-at-use mixed precision for modules that hold explicit
    f32 params (e.g. HiFi-GAN's lax.conv weights): cast the float leaves to
    the compute dtype inside the loss. The cast is differentiable, so grads
    arrive back in f32 against the f32 master params. No-op when dtype is
    None."""
    if dtype is None:
        return params
    import jax

    return jax.tree.map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params
    )
