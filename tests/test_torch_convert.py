"""Torch -> flax layout conversion rules, verified against torch ops, and
a full HiFi-GAN generator parity check (torch stack built inline from
library layers — the conversion contract, not reference code)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dicttts_tpu.models.hifigan import HifiGanGenerator
from dicttts_tpu.utils.torch_convert import (
    conv1d_to_flax,
    conv_transpose1d_to_flax,
    convert_hifigan_generator,
    fold_weight_norm,
    linear_to_flax,
)


def test_conv1d_layout():
    import flax.linen as nn

    tc = torch.nn.Conv1d(4, 6, 5, padding=2)
    x = np.random.RandomState(0).randn(2, 4, 16).astype(np.float32)
    y_t = tc(torch.tensor(x)).detach().numpy()  # [B, C, T]
    fc = nn.Conv(6, (5,), padding="SAME")
    params = {"params": {"kernel": jnp.asarray(conv1d_to_flax(tc.weight.detach().numpy())),
                         "bias": jnp.asarray(tc.bias.detach().numpy())}}
    y_f = np.asarray(fc.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(y_f, y_t.transpose(0, 2, 1), atol=1e-5)


def test_conv_transpose1d_layout():
    from dicttts_tpu.models.hifigan import UpsampleConv

    k, s = 16, 8
    tc = torch.nn.ConvTranspose1d(4, 6, k, s, padding=(k - s) // 2)
    x = np.random.RandomState(1).randn(2, 4, 10).astype(np.float32)
    y_t = tc(torch.tensor(x)).detach().numpy()
    up = UpsampleConv(6, k, s)
    params = {"params": {"kernel": jnp.asarray(conv_transpose1d_to_flax(tc.weight.detach().numpy())),
                         "bias": jnp.asarray(tc.bias.detach().numpy())}}
    y_f = np.asarray(up.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(y_f, y_t.transpose(0, 2, 1), atol=1e-5)


def test_weight_norm_folding():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(3, 5, 3, padding=1))
    x = torch.randn(1, 3, 8)
    y_ref = conv(x).detach().numpy()
    w = fold_weight_norm(
        conv.weight_v.detach().numpy(), conv.weight_g.detach().numpy(), dim=0
    )
    conv2 = torch.nn.Conv1d(3, 5, 3, padding=1)
    conv2.weight.data = torch.tensor(w)
    conv2.bias.data = conv.bias.data
    np.testing.assert_allclose(conv2(x).detach().numpy(), y_ref, atol=1e-6)


def _torch_hifigan_tiny(rates, kernels, ch0, res_k, res_d):
    """Inline torch replica of the HiFi-GAN generator graph (library layers
    only) to validate the converted param tree end-to-end."""
    import torch.nn.functional as F

    mods = {"conv_pre": torch.nn.Conv1d(80, ch0, 7, padding=3)}
    ups, res = [], []
    for i, (u, k) in enumerate(zip(rates, kernels)):
        ch = ch0 // (2 ** (i + 1))
        ups.append(torch.nn.ConvTranspose1d(ch * 2, ch, k, u, padding=(k - u) // 2))
        for rk, rd in zip(res_k, res_d):
            res.append(
                (
                    torch.nn.ModuleList(
                        [torch.nn.Conv1d(ch, ch, rk, padding=(rk * d - d) // 2, dilation=d) for d in rd]
                    ),
                    torch.nn.ModuleList(
                        [torch.nn.Conv1d(ch, ch, rk, padding=rk // 2) for _ in rd]
                    ),
                )
            )
    mods["conv_post"] = torch.nn.Conv1d(ch, 1, 7, padding=3)

    def forward(mel):  # mel [B, 80, T]
        x = mods["conv_pre"](mel)
        n_k = len(res_k)
        for i in range(len(rates)):
            x = F.leaky_relu(x, 0.1)
            x = ups[i](x)
            acc = None
            for j in range(n_k):
                convs1, convs2 = res[i * n_k + j]
                h = x
                for c1, c2 in zip(convs1, convs2):
                    t = F.leaky_relu(h, 0.1)
                    t = c1(t)
                    t = F.leaky_relu(t, 0.1)
                    t = c2(t)
                    h = h + t
                acc = h if acc is None else acc + h
            x = acc / n_k
        x = F.leaky_relu(x)
        return torch.tanh(mods["conv_post"](x))

    # assemble a reference-style state dict
    state = {}
    state["conv_pre.weight"] = mods["conv_pre"].weight.detach().numpy()
    state["conv_pre.bias"] = mods["conv_pre"].bias.detach().numpy()
    for i, up in enumerate(ups):
        state[f"ups.{i}.weight"] = up.weight.detach().numpy()
        state[f"ups.{i}.bias"] = up.bias.detach().numpy()
    for r, (convs1, convs2) in enumerate(res):
        for d, (c1, c2) in enumerate(zip(convs1, convs2)):
            state[f"resblocks.{r}.convs1.{d}.weight"] = c1.weight.detach().numpy()
            state[f"resblocks.{r}.convs1.{d}.bias"] = c1.bias.detach().numpy()
            state[f"resblocks.{r}.convs2.{d}.weight"] = c2.weight.detach().numpy()
            state[f"resblocks.{r}.convs2.{d}.bias"] = c2.bias.detach().numpy()
    state["conv_post.weight"] = mods["conv_post"].weight.detach().numpy()
    state["conv_post.bias"] = mods["conv_post"].bias.detach().numpy()
    return forward, state


def test_full_generator_parity():
    torch.manual_seed(0)
    rates, kernels = (4, 4), (8, 8)
    res_k, res_d = (3,), ((1, 3, 5),)
    fwd, state = _torch_hifigan_tiny(rates, kernels, 32, res_k, res_d)
    params = convert_hifigan_generator(state, rates, n_kernels=1, n_dilations=3)
    gen = HifiGanGenerator(
        upsample_rates=rates, upsample_kernel_sizes=kernels,
        upsample_initial_channel=32, resblock_kernel_sizes=res_k,
        resblock_dilation_sizes=res_d,
    )
    mel = np.random.RandomState(2).randn(1, 12, 80).astype(np.float32)
    y_t = fwd(torch.tensor(mel.transpose(0, 2, 1))).detach().numpy()[:, 0]
    y_f = np.asarray(gen.apply({"params": params}, jnp.asarray(mel)))
    assert y_f.shape == y_t.shape
    np.testing.assert_allclose(y_f, y_t, atol=2e-4)


def test_wn_conversion_parity():
    """Our WN forward on converted params must match a torch gated-WaveNet
    stack built from library convs (standard fused tanh-sigmoid gating)."""
    from dicttts_tpu.models.wavenet import WN
    from dicttts_tpu.utils.torch_convert import convert_wn

    torch.manual_seed(0)
    H, k, n_layers, gin, T = 8, 3, 3, 6, 12
    in_layers = [torch.nn.Conv1d(H, 2 * H, k, padding=(k - 1) // 2 * d, dilation=d)
                 for d in [1, 1, 1]]
    res_skip = [torch.nn.Conv1d(H, 2 * H if i < n_layers - 1 else H, 1) for i in range(n_layers)]
    cond = torch.nn.Conv1d(gin, 2 * H * n_layers, 1)

    def torch_wn(x, g):  # x [B, H, T], g [B, gin, T]
        out = torch.zeros_like(x)
        gc = cond(g)
        for i in range(n_layers):
            a = in_layers[i](x) + gc[:, i * 2 * H:(i + 1) * 2 * H]
            acts = torch.tanh(a[:, :H]) * torch.sigmoid(a[:, H:])
            rs = res_skip[i](acts)
            if i < n_layers - 1:
                x = x + rs[:, :H]
                out = out + rs[:, H:]
            else:
                out = out + rs
        return out

    state = {}
    for i in range(n_layers):
        state[f"in_layers.{i}.weight"] = in_layers[i].weight.detach().numpy()
        state[f"in_layers.{i}.bias"] = in_layers[i].bias.detach().numpy()
        state[f"res_skip_layers.{i}.weight"] = res_skip[i].weight.detach().numpy()
        state[f"res_skip_layers.{i}.bias"] = res_skip[i].bias.detach().numpy()
    state["cond_layer.weight"] = cond.weight.detach().numpy()
    state["cond_layer.bias"] = cond.bias.detach().numpy()
    params = convert_wn(state, "", n_layers)

    x = np.random.RandomState(0).randn(2, H, T).astype(np.float32)
    g = np.random.RandomState(1).randn(2, gin, T).astype(np.float32)
    y_t = torch_wn(torch.tensor(x), torch.tensor(g)).detach().numpy()
    wn = WN(hidden_channels=H, kernel_size=k, n_layers=n_layers, gin_channels=gin)
    y_f = np.asarray(
        wn.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)),
                 jnp.ones((2, T, 1)), jnp.asarray(g.transpose(0, 2, 1)))
    )
    np.testing.assert_allclose(y_f, y_t.transpose(0, 2, 1), atol=1e-5)
