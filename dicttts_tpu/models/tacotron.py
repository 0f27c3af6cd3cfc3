"""Tacotron-family legacy registry entries (CBHG encoder, Tacotron2
conv+BiLSTM encoder, BiLSTM RNN decoder) and the BertEncoder scaffold.

Capability parity with the reference's FastSpeech2 encoder/decoder registry
alternatives (/root/reference/modules/fastspeech/fast_tacotron.py and
tts_modules.py BertEncoder, reachable from fs2.py:13-41). These are legacy
paths no shipped reference config uses; they are provided so every registry
name resolves. TPU-idiomatic divergences (documented): norm layers are
stateless LayerNorm instead of BatchNorm1d (no mutable batch_stats under
jit), and the bidirectional RNNs scan full padded length over zero-masked
inputs instead of pack_padded_sequence (same outputs on the nonpadded
region up to the norm change).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dicttts_tpu.models.layers import LayerNorm


class PreNet(nn.Module):
    """fc-relu-dropout x2 (fast_tacotron.py PreNet); dropout stays ON at
    inference in classic Tacotron — controlled by `deterministic` here."""

    fc1_dims: int = 256
    fc2_dims: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.relu(nn.Dense(self.fc1_dims)(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(self.fc2_dims)(x))
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class HighwayNetwork(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(x.shape[-1], name="W1")(x))
        g = nn.sigmoid(nn.Dense(x.shape[-1], name="W2")(x))
        return g * h + (1.0 - g) * x


class NormConv(nn.Module):
    """conv (no bias) + optional relu + LayerNorm (the reference's
    BatchNormConv with a stateless norm)."""

    channels: int
    kernel: int
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (self.kernel,), padding="SAME", use_bias=False)(x)
        if self.relu:
            x = nn.relu(x)
        return LayerNorm()(x)


class BiGRU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.GRUCell(self.features), name="fwd")(x)
        bwd = nn.RNN(nn.GRUCell(self.features), name="bwd", reverse=True,
                     keep_order=True)(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class BiLSTM(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.features), name="fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.features), name="bwd", reverse=True,
                     keep_order=True)(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class CBHG(nn.Module):
    """Conv bank (k=1..K) -> maxpool(2,1) -> 2 projection convs -> residual
    -> highways -> BiGRU (fast_tacotron.py CBHG)."""

    K: int
    channels: int
    proj_channels: Sequence[int] = ()
    num_highways: int = 4

    @nn.compact
    def __call__(self, x):
        proj = tuple(self.proj_channels) or (self.channels, self.channels)
        residual = x  # [B, T, C]
        bank = jnp.concatenate(
            [NormConv(self.channels, k, name=f"bank_{k}")(x) for k in range(1, self.K + 1)],
            axis=-1,
        )
        # maxpool kernel 2 stride 1 (SAME length)
        pooled = jnp.maximum(bank, jnp.pad(bank, ((0, 0), (0, 1), (0, 0)),
                                           constant_values=-jnp.inf)[:, 1:])
        x = NormConv(proj[0], 3, name="proj1")(pooled)
        x = NormConv(proj[1], 3, relu=False, name="proj2")(x)
        x = x + residual
        if proj[-1] != self.channels:
            x = nn.Dense(self.channels, use_bias=False, name="pre_highway")(x)
        for i in range(self.num_highways):
            x = HighwayNetwork(name=f"highway_{i}")(x)
        return BiGRU(self.channels)(x)


class TacotronEncoder(nn.Module):
    """embed -> PreNet -> CBHG -> linear (fast_tacotron.py:133-150)."""

    n_vocab: int
    channels: int
    K: int = 8
    num_highways: int = 4
    dropout: float = 0.5

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        x = nn.Embed(self.n_vocab, self.channels)(tokens)
        x = PreNet(self.channels, self.channels, self.dropout)(x, deterministic)
        x = CBHG(self.K, self.channels, num_highways=self.num_highways)(x)
        return nn.Dense(self.channels)(x)


class Tacotron2Encoder(nn.Module):
    """embed -> 3x[conv5 relu norm dropout + residual] -> BiLSTM
    (fast_tacotron.py:153-190)."""

    n_vocab: int
    channels: int
    n_convolutions: int = 3
    kernel_size: int = 5

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        x = nn.Embed(self.n_vocab, self.channels)(tokens)
        for i in range(self.n_convolutions):
            h = NormConv(self.channels, self.kernel_size, name=f"conv_{i}")(x)
            h = nn.Dropout(0.5)(h, deterministic=deterministic)
            x = x + h
        x = BiLSTM(self.channels // 2)(x)
        mask = (tokens > 0).astype(x.dtype)[:, :, None]
        return x * mask


class DecoderRNN(nn.Module):
    """2x conv9 -> LN -> BiLSTM -> conv3 (fast_tacotron.py DecoderRNN)."""

    hidden_size: int
    decoder_rnn_dim: int = 0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, nonpadding, deterministic: bool = True):
        rnn_dim = self.decoder_rnn_dim or self.hidden_size * 2
        mask = nonpadding[:, :, None]
        h = nn.Conv(self.hidden_size, (9,), padding="SAME")(x)
        h = nn.relu(h)
        h = nn.Conv(self.hidden_size, (9,), padding="SAME")(h)
        h = LayerNorm()(h) * mask
        h = BiLSTM(rnn_dim)(h) * mask
        return nn.Conv(self.hidden_size, (3,), padding="SAME")(h) * mask


class BertEncoderScaffold(nn.Module):
    """FFT blocks + char-prediction head (reference BertEncoder,
    tts_modules.py:724-732) — the masked-char pretraining scaffold."""

    num_chars: int
    hidden_size: int
    num_layers: int = 4
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from dicttts_tpu.models.fft_blocks import FFTBlocks

        nonpadding = (jnp.abs(x).sum(-1) > 0).astype(x.dtype)
        h = FFTBlocks(self.hidden_size, self.num_layers, self.kernel_size)(
            x, nonpadding, deterministic
        )
        return h, nn.Dense(self.num_chars)(h)
