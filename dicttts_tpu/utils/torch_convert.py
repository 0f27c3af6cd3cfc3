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


# ---------------------------------------------------------------------------
# Full acoustic-model conversion (reference PortaSpeech_dict -> our DictTTS).
# Verified module-by-module and whole-model by tests/test_model_parity.py
# against the actual reference torch modules.
# ---------------------------------------------------------------------------


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    """torch Conv1d kernel-1 weight [out, in, 1] -> flax Dense kernel [in, out]."""
    return np.transpose(w[:, :, 0], (1, 0))


def _conv(state: dict, prefix: str) -> dict:
    """torch Conv1d -> flax Conv params (weight norm folded if present)."""
    return {
        "kernel": conv1d_to_flax(_maybe_fold(state, prefix)),
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def _conv_transpose(state: dict, prefix: str) -> dict:
    """torch ConvTranspose1d -> flax ConvTranspose params (mapping verified
    exact: flip taps then [in, out, k] -> [k, in, out])."""
    return {
        "kernel": conv_transpose1d_to_flax(_maybe_fold(state, prefix)),
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def _ln(state: dict, prefix: str) -> dict:
    """reference channel LayerNorm (gamma/beta) -> our LayerNorm params."""
    return {
        "gamma": np.asarray(state[f"{prefix}.gamma"]),
        "beta": np.asarray(state[f"{prefix}.beta"]),
    }


def convert_encoder_layers(state: dict, prefix: str, n_layers: int,
                           window_size: int | None = None) -> dict:
    """Reference rel-transformer `Encoder` (pre_ln=True,
    rel_transformer_encoder.py:25-80) -> our RelTransformerLayers params."""
    out: dict = {}
    for i in range(n_layers):
        attn = {
            "q": {"kernel": _conv1x1_to_dense(np.asarray(state[f"{prefix}attn_layers.{i}.conv_q.weight"])),
                  "bias": np.asarray(state[f"{prefix}attn_layers.{i}.conv_q.bias"])},
            "k": {"kernel": _conv1x1_to_dense(np.asarray(state[f"{prefix}attn_layers.{i}.conv_k.weight"])),
                  "bias": np.asarray(state[f"{prefix}attn_layers.{i}.conv_k.bias"])},
            "v": {"kernel": _conv1x1_to_dense(np.asarray(state[f"{prefix}attn_layers.{i}.conv_v.weight"])),
                  "bias": np.asarray(state[f"{prefix}attn_layers.{i}.conv_v.bias"])},
            "out": {"kernel": _conv1x1_to_dense(np.asarray(state[f"{prefix}attn_layers.{i}.conv_o.weight"])),
                    "bias": np.asarray(state[f"{prefix}attn_layers.{i}.conv_o.bias"])},
        }
        if window_size is not None:
            attn["rel_k"] = np.asarray(state[f"{prefix}attn_layers.{i}.emb_rel_k"])
            attn["rel_v"] = np.asarray(state[f"{prefix}attn_layers.{i}.emb_rel_v"])
        out[f"RelMultiHeadAttention_{i}"] = attn
        out[f"LayerNorm_{2 * i}"] = _ln(state, f"{prefix}norm_layers_1.{i}")
        out[f"LayerNorm_{2 * i + 1}"] = _ln(state, f"{prefix}norm_layers_2.{i}")
        out[f"ConvFFN_{i}"] = {
            "Conv_0": _conv(state, f"{prefix}ffn_layers.{i}.conv_1"),
            "Conv_1": _conv(state, f"{prefix}ffn_layers.{i}.conv_2"),
        }
    if f"{prefix}last_ln.gamma" in state:  # pre_ln
        out[f"LayerNorm_{2 * n_layers}"] = _ln(state, f"{prefix}last_ln")
    return out


def convert_conv_relu_norm(state: dict, prefix: str, n_layers: int = 3) -> dict:
    """Reference ConvReluNorm prenet -> our ConvReluNorm params. Flax names
    the loop convs Conv_0..Conv_{n-1} and the zero-init proj Conv_{n}."""
    out: dict = {}
    for i in range(n_layers):
        out[f"Conv_{i}"] = _conv(state, f"{prefix}conv_layers.{i}")
        out[f"LayerNorm_{i}"] = _ln(state, f"{prefix}norm_layers.{i}")
    out[f"Conv_{n_layers}"] = _conv(state, f"{prefix}proj")
    return out


def convert_rel_encoder(state: dict, prefix: str, n_layers: int,
                        window_size: int | None = 4, prenet: bool = True) -> dict:
    """Reference RelTransformerEncoder (emb + ConvReluNorm prenet + Encoder)
    -> our RelTransformerEncoder params."""
    out: dict = {"Embed_0": {"embedding": np.asarray(state[f"{prefix}emb.weight"])}}
    if prenet:
        out["ConvReluNorm_0"] = convert_conv_relu_norm(state, f"{prefix}pre.", 3)
    out["RelTransformerLayers_0"] = convert_encoder_layers(
        state, f"{prefix}encoder.", n_layers, window_size
    )
    return out


def convert_s2pa_attention(state: dict, prefix: str) -> dict:
    """Reference S2PAAttention (dict_encoder.py:17-66) -> our S2PAAttention."""
    return {
        "q": {"kernel": linear_to_flax(np.asarray(state[f"{prefix}q_transform.weight"]))},
        "k": {"kernel": linear_to_flax(np.asarray(state[f"{prefix}k_transform.weight"]))},
        "v": {"kernel": linear_to_flax(np.asarray(state[f"{prefix}v_transform.weight"]))},
        "out": {"kernel": linear_to_flax(np.asarray(state[f"{prefix}output_transform.weight"]))},
        "pinyin_embedding": {"embedding": np.asarray(state[f"{prefix}pinyin_embedding.weight"])},
    }


def convert_s2pa_text_encoder(state: dict, prefix: str, n_layers: int = 4) -> dict:
    """Reference S2PATextEncoder (dict_encoder.py:69-144; both sub-encoders
    are 4-layer, window_size=None) -> our S2PATextEncoder params."""
    return {
        "word_emb": {"embedding": np.asarray(state[f"{prefix}word_emb.weight"])},
        "semantic_encoder": convert_encoder_layers(state, f"{prefix}semantic_encoder.", n_layers, None),
        "s2pa": convert_s2pa_attention(state, f"{prefix}s2pa_attention."),
        "linguistic_encoder": convert_encoder_layers(state, f"{prefix}linguistic_encoder.", n_layers, None),
    }


def convert_duration_predictor(state: dict, prefix: str, n_layers: int) -> dict:
    """Reference DurationPredictor (PortaSpeech variant, model.py:38-66 —
    Sequential per layer: [pad, conv, relu, LayerNorm, dropout]; the
    Softplus head has no params) -> our DurationPredictor params. Handles
    both the Sequential linear (`linear.0`) and the plain tts_modules
    variant (`linear`)."""
    out: dict = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = _conv(state, f"{prefix}conv.{i}.1")
        out[f"ln_{i}"] = {
            "gamma": np.asarray(state[f"{prefix}conv.{i}.3.weight"]),
            "beta": np.asarray(state[f"{prefix}conv.{i}.3.bias"]),
        }
    lin = f"{prefix}linear.0" if f"{prefix}linear.0.weight" in state else f"{prefix}linear"
    out["out"] = {
        "kernel": linear_to_flax(np.asarray(state[f"{lin}.weight"])),
        "bias": np.asarray(state[f"{lin}.bias"]),
    }
    return out


def convert_strided_prenet(state: dict, prefix: str, n_convs: int) -> dict:
    return {f"conv_{i}": _conv(state, f"{prefix}{i}") for i in range(n_convs)}


def convert_transposed_prenet(state: dict, prefix: str, n_convs: int) -> dict:
    return {f"deconv_{i}": _conv_transpose(state, f"{prefix}{i}") for i in range(n_convs)}


def convert_coupling_block(state: dict, prefix: str, n_flows: int, wn_layers: int) -> dict:
    """Reference ResidualCouplingBlock (glow_modules.py:75-164; flows list
    alternates coupling layers at even indices with param-less Flips) ->
    our ResidualCouplingBlock params."""
    out: dict = {}
    for i in range(n_flows):
        fp = f"{prefix}flows.{2 * i}."
        out[f"coupling_{i}"] = {
            "pre": _conv(state, f"{fp}pre"),
            "enc": convert_wn(state, f"{fp}enc.", wn_layers),
            "post": _conv(state, f"{fp}post"),
        }
    return out


def convert_fvae(state: dict, prefix: str = "fvae.", n_strides: int = 1,
                 enc_n_layers: int = 8, dec_n_layers: int = 4,
                 flow_n_blocks: int = 4, flow_wn_layers: int = 4) -> dict:
    """Reference FVAE / FVAE_semantics -> our FVAE params."""
    out = {
        "g_pre_net": convert_strided_prenet(state, f"{prefix}g_pre_net.", n_strides),
        "encoder": {
            "StridedPreNet_0": convert_strided_prenet(state, f"{prefix}encoder.pre_net.", n_strides),
            "WN_0": convert_wn(state, f"{prefix}encoder.wn.", enc_n_layers),
            "out_proj": _conv(state, f"{prefix}encoder.out_proj"),
        },
        "decoder": {
            "TransposedPreNet_0": convert_transposed_prenet(state, f"{prefix}decoder.pre_net.", n_strides),
            "WN_0": convert_wn(state, f"{prefix}decoder.wn.", dec_n_layers),
            "out_proj": _conv(state, f"{prefix}decoder.out_proj"),
        },
    }
    if f"{prefix}prior_flow.flows.0.pre.weight" in state:
        out["prior_flow"] = convert_coupling_block(
            state, f"{prefix}prior_flow.", flow_n_blocks, flow_wn_layers
        )
    return out


def strip_prefix(state: dict, prefix: str) -> dict:
    """Select keys under `prefix` (e.g. 'model.') and strip it."""
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def convert_dict_tts(torch_state: dict, dur_predictor_layers: int = 3,
                     enc_n_layers: int = 4, fvae_enc_n_layers: int = 8,
                     fvae_dec_n_layers: int = 4, prior_flow_n_blocks: int = 4) -> dict:
    """Full reference PortaSpeech_dict state_dict -> our DictTTS params tree.

    Leftover reference params that our model intentionally does not have are
    ignored: the unused word->frame attention stack kept by the base class
    (sin_pos/enc_pos_proj/dec_query_proj/dec_res_proj/attn — PortaSpeech_dict
    overrides run_text_encoder with a plain gather, model.py:105-107) and the
    dead `emb` Embedding in S2PATextEncoder (forward only uses word_emb).
    """
    state = {k: np.asarray(v) for k, v in torch_state.items()}
    params = {
        "dict_encoder": {
            "s2pa_module": convert_s2pa_text_encoder(
                state, "dict_encoder.S2PA_module.", enc_n_layers
            )
        },
        "dur_predictor": convert_duration_predictor(state, "dur_predictor.", dur_predictor_layers),
        "fvae": convert_fvae(
            state, "fvae.", 1, fvae_enc_n_layers, fvae_dec_n_layers, prior_flow_n_blocks, 4
        ),
    }
    if "spk_embed_proj.weight" in state:
        params["spk_embed_proj"] = {"embedding": state["spk_embed_proj.weight"]}
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .ckpt/.pt file into a flat {name: ndarray} dict.

    Handles the reference's formats: vocoder yaml ckpts
    ({'state_dict': {'model_gen': ...}} / json {'generator': ...}) and task
    ckpts whose state_dict nests per-child dicts
    ({'state_dict': {'model': {...}, 'mel_disc': {...}}},
    utils/trainer.py:436-449) — children flatten to 'model.xxx' keys."""
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
        if isinstance(v, dict):  # nested child module state_dict
            for kk, vv in v.items():
                try:
                    out[f"{k}.{kk}"] = vv.detach().cpu().numpy()
                except AttributeError:
                    pass
            continue
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            pass
    return out
