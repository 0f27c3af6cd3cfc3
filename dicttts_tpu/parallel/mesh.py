"""Device mesh + sharding helpers: the distributed backbone.

Replaces the reference's mp.spawn + NCCL DDP stack
(/root/reference/utils/trainer.py:454-489, utils/ddp_utils.py) with the
TPU-native SPMD recipe (SURVEY.md §2.3/§5): one process per host, a 1-D
``data`` mesh over all devices, batches sharded on the leading axis with
`NamedSharding`, parameters replicated, and gradient reduction done by the
XLA all-reduce that jit inserts automatically. Multi-host extends the same
mesh over DCN via `jax.distributed.initialize` — no wrapper class needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host-resident numpy batch on the mesh, batch-axis sharded.

    Batch sizes must be divisible by the mesh size (the host pipeline pads
    batches to a devices-multiple, reference batch_by_size
    required_batch_size_multiple semantics).
    """
    sharding = batch_sharding(mesh, axis)

    def spec(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return x, replicated(mesh)
        assert x.shape[0] % mesh.size == 0, (
            f"batch dim {x.shape[0]} not divisible by mesh size {mesh.size}"
        )
        return x, sharding

    # ONE batched device_put for the whole tree: per-leaf puts each pay a
    # fixed host->device issuance fee (large through this sandbox's relay)
    arrays, shardings = _unzip_tree(batch, spec)
    return jax.device_put(arrays, shardings)


def shard_stacked_batches(stacked: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a [K, B, ...] stack of K same-shape batches on the mesh with the
    PER-STEP batch axis (axis 1) sharded and the scan axis replicated —
    P(None, 'data'). Without this the scanned multi-step dispatch would see a
    host numpy array and default to fully-replicated placement, silently
    losing data parallelism on the hot path."""
    sharding = NamedSharding(mesh, P(None, axis))

    def spec(x):
        x = np.asarray(x)
        if x.ndim <= 1:  # [K] scalars-per-step: replicate
            return x, replicated(mesh)
        assert x.shape[1] % mesh.size == 0, (
            f"batch dim {x.shape[1]} not divisible by mesh size {mesh.size}"
        )
        return x, sharding

    arrays, shardings = _unzip_tree(stacked, spec)
    return jax.device_put(arrays, shardings)


def _unzip_tree(tree: Any, spec) -> tuple:
    """Map `spec(leaf) -> (array, sharding)` over a pytree, returning the
    (arrays, shardings) pytree pair device_put accepts in one batched call."""
    pairs = jax.tree.map(spec, tree, is_leaf=lambda x: not isinstance(x, dict))
    arrays = jax.tree.map(lambda p: p[0], pairs, is_leaf=lambda x: isinstance(x, tuple))
    shardings = jax.tree.map(lambda p: p[1], pairs, is_leaf=lambda x: isinstance(x, tuple))
    return arrays, shardings


def pad_batch_to_devices(batch: dict, n_devices: int) -> dict:
    """Right-pad every array's batch axis to a devices-multiple with zeros.

    Padded rows carry all-zero tokens/mels, so the loss masks (nonzero-mel
    weights, token nonpadding) ignore them by construction.
    """
    def pad(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return x
        rem = (-x.shape[0]) % n_devices
        if rem == 0:
            return x
        pad_widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_widths)

    return {k: pad(v) for k, v in batch.items()}


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Place a train-state pytree on the mesh fully replicated."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
