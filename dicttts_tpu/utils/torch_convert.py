"""Convert reference (PyTorch) checkpoints into this framework's params.

Lets users bring weights trained with the reference implementation (e.g.
the published pretrained HiFi-GAN vocoder, readme.md:65-101): torch tensors
are re-laid-out for the feature-last flax modules and weight norm is folded
(w = g * v / ||v||) — matching this framework's folded-weight-norm design
(models/layers.py docstring).

Layout rules (verified by tests/test_torch_convert.py against torch ops):
- Linear:        torch [out, in]          -> flax Dense kernel [in, out]
- Conv1d:        torch [out, in, k]       -> flax Conv kernel [k, in, out]
- ConvTranspose1d: torch [in, out, k]     -> flax-adjoint kernel
                  [k, in, out] with the tap axis REVERSED (flax/our
                  UpsampleConv use the flipped-kernel adjoint convention)
- Embedding:     identical [num, dim]
"""

from __future__ import annotations

import numpy as np


def fold_weight_norm(v: np.ndarray, g: np.ndarray, dim: int = 0) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all axes except `dim`
    (torch weight_norm semantics)."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt(np.sum(v**2, axis=axes, keepdims=True))
    g = np.reshape(g, norm.shape)
    return (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)


def conv1d_to_flax(w: np.ndarray) -> np.ndarray:
    """[out, in, k] -> [k, in, out]."""
    return np.transpose(w, (2, 1, 0))


def linear_to_flax(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(w, (1, 0))


def conv_transpose1d_to_flax(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [in, out, k] -> our flipped-adjoint [k, in, out]."""
    return np.transpose(w[:, :, ::-1], (2, 0, 1)).copy()


def _maybe_fold(state: dict, prefix: str, dim: int = 0) -> np.ndarray | None:
    """Resolve `<prefix>.weight`, folding weight norm if _g/_v present."""
    if f"{prefix}.weight_v" in state:
        return fold_weight_norm(
            np.asarray(state[f"{prefix}.weight_v"]), np.asarray(state[f"{prefix}.weight_g"]), dim
        )
    if f"{prefix}.weight" in state:
        return np.asarray(state[f"{prefix}.weight"])
    return None


def convert_hifigan_generator(torch_state: dict, upsample_rates=(8, 8, 2, 2),
                              n_kernels: int = 3, n_dilations: int = 3) -> dict:
    """Reference HifiGanGenerator state_dict -> our flax param tree.

    Reference module names (modules/hifigan/hifigan.py:101-151): conv_pre,
    ups.{i}, resblocks.{i*n_kernels+j}.convs1.{d}/convs2.{d}, conv_post.
    """
    state = {k: np.asarray(v) for k, v in torch_state.items()}
    params: dict = {}
    params["conv_pre"] = {
        "kernel": conv1d_to_flax(_maybe_fold(state, "conv_pre")),
        "bias": state["conv_pre.bias"],
    }
    n_ups = len(upsample_rates)
    for i in range(n_ups):
        params[f"up_{i}"] = {
            "kernel": conv_transpose1d_to_flax(_maybe_fold(state, f"ups.{i}")),
            "bias": state[f"ups.{i}.bias"],
        }
        for j in range(n_kernels):
            r = i * n_kernels + j
            blk = {}
            for d in range(n_dilations):
                blk[f"conv1_{d}_kernel"] = conv1d_to_flax(_maybe_fold(state, f"resblocks.{r}.convs1.{d}"))
                blk[f"conv1_{d}_bias"] = state[f"resblocks.{r}.convs1.{d}.bias"]
                blk[f"conv2_{d}_kernel"] = conv1d_to_flax(_maybe_fold(state, f"resblocks.{r}.convs2.{d}"))
                blk[f"conv2_{d}_bias"] = state[f"resblocks.{r}.convs2.{d}.bias"]
            params[f"res_{i}_{j}"] = blk
    params["conv_post_kernel"] = conv1d_to_flax(_maybe_fold(state, "conv_post"))
    params["conv_post_bias"] = state["conv_post.bias"]
    return params


def convert_wn(torch_state: dict, prefix: str, n_layers: int) -> dict:
    """Torch WaveNet-stack params -> our models/wavenet.WN param tree.

    Expected torch names under `prefix`: in_layers.{i} (dilated Conv1d,
    possibly weight-normed), res_skip_layers.{i} (1x1), cond_layer (1x1) —
    the standard gated-WaveNet layout the reference's FVAE/flows use."""
    out: dict = {}
    cond = _maybe_fold(torch_state, f"{prefix}cond_layer")
    if cond is not None:
        out["cond"] = {
            "kernel": conv1d_to_flax(cond),
            "bias": np.asarray(torch_state[f"{prefix}cond_layer.bias"]),
        }
    for i in range(n_layers):
        out[f"in_{i}"] = {
            "kernel": conv1d_to_flax(_maybe_fold(torch_state, f"{prefix}in_layers.{i}")),
            "bias": np.asarray(torch_state[f"{prefix}in_layers.{i}.bias"]),
        }
        out[f"res_skip_{i}"] = {
            "kernel": conv1d_to_flax(_maybe_fold(torch_state, f"{prefix}res_skip_layers.{i}")),
            "bias": np.asarray(torch_state[f"{prefix}res_skip_layers.{i}.bias"]),
        }
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .ckpt/.pt file into numpy dicts (CPU, no grad)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if isinstance(ckpt, dict) and "model_gen" in ckpt:
        ckpt = ckpt["model_gen"]
    if isinstance(ckpt, dict) and "generator" in ckpt:
        ckpt = ckpt["generator"]
    out = {}
    for k, v in ckpt.items():
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            pass
    return out
