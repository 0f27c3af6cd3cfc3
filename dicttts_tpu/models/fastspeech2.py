"""FastSpeech2 baseline acoustic model with encoder/decoder registries.

Capability parity with /root/reference/modules/fastspeech/fs2.py:13-212:
token embedding -> encoder (registry: 'fft' | 'rel_fft') -> duration
predictor + length regulation -> optional pitch predictor/embedding (coarse
f0 buckets + uv, frame-level) -> decoder (registry: 'fft' | 'conv' | 'wn')
-> linear mel head. Straight-through predictor_grad mixing on predictor
inputs; static max_frames at inference.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.duration import DurationPredictor
from dicttts_tpu.models.fft_blocks import FFTBlocks
from dicttts_tpu.models.layers import LayerNorm, RelTransformerEncoder
from dicttts_tpu.models.wavenet import WN
from dicttts_tpu.ops.pitch import denorm_f0, f0_to_coarse
from dicttts_tpu.ops.seq import gather_expand, length_regulate

FS_ENCODERS: dict[str, Callable] = {}
FS_DECODERS: dict[str, Callable] = {}


def register_encoder(name):
    def deco(fn):
        FS_ENCODERS[name] = fn
        return fn

    return deco


def register_decoder(name):
    def deco(fn):
        FS_DECODERS[name] = fn
        return fn

    return deco


@register_encoder("fft")
def _fft_encoder(cfg):
    class FFTEncoder(nn.Module):
        @nn.compact
        def __call__(self, tokens, deterministic=True):
            H = cfg.get("hidden_size", 256)
            emb = nn.Embed(cfg["n_vocab"], H, embedding_init=nn.initializers.normal(H**-0.5))
            x = emb(tokens) * (H**0.5)
            nonpadding = (tokens > 0).astype(x.dtype)
            return FFTBlocks(
                H, cfg.get("enc_layers", 4), cfg.get("enc_ffn_kernel_size", 9),
                cfg.get("num_heads", 2), cfg.get("dropout", 0.1),
            )(x, nonpadding, deterministic)

    return FFTEncoder()


@register_encoder("conformer")
def _conformer_encoder(cfg):
    from dicttts_tpu.models.conformer import ConformerLayers

    class ConformerEncoder(nn.Module):
        @nn.compact
        def __call__(self, tokens, deterministic=True):
            H = cfg.get("hidden_size", 256)
            emb = nn.Embed(cfg["n_vocab"], H, embedding_init=nn.initializers.normal(H**-0.5))
            x = emb(tokens) * (H**0.5)
            nonpadding = (tokens > 0).astype(x.dtype)
            return ConformerLayers(
                H, cfg.get("enc_layers", 4), cfg.get("num_heads", 2),
                dropout=cfg.get("dropout", 0.1),
            )(x, nonpadding, deterministic)

    return ConformerEncoder()


@register_decoder("conformer")
def _conformer_decoder(cfg):
    from dicttts_tpu.models.conformer import ConformerLayers

    class ConformerDecoder(nn.Module):
        @nn.compact
        def __call__(self, x, nonpadding, deterministic=True):
            return ConformerLayers(
                cfg.get("hidden_size", 256), cfg.get("dec_layers", 4),
                cfg.get("num_heads", 2), dropout=cfg.get("dropout", 0.1),
            )(x, nonpadding, deterministic)

    return ConformerDecoder()


@register_encoder("tacotron")
def _tacotron_encoder(cfg):
    from dicttts_tpu.models.tacotron import TacotronEncoder

    return TacotronEncoder(
        n_vocab=cfg["n_vocab"], channels=cfg.get("hidden_size", 256),
        K=cfg.get("encoder_K", 8), num_highways=cfg.get("num_highways", 4),
        dropout=cfg.get("dropout", 0.5),
    )


@register_encoder("tacotron2")
def _tacotron2_encoder(cfg):
    from dicttts_tpu.models.tacotron import Tacotron2Encoder

    return Tacotron2Encoder(n_vocab=cfg["n_vocab"], channels=cfg.get("hidden_size", 256))


@register_decoder("rnn")
def _rnn_decoder(cfg):
    from dicttts_tpu.models.tacotron import DecoderRNN

    return DecoderRNN(
        hidden_size=cfg.get("hidden_size", 256),
        decoder_rnn_dim=cfg.get("decoder_rnn_dim", 0),
        dropout=cfg.get("dropout", 0.1),
    )


@register_encoder("rel_fft")
def _rel_fft_encoder(cfg):
    return RelTransformerEncoder(
        n_vocab=cfg["n_vocab"],
        hidden_channels=cfg.get("hidden_size", 256),
        filter_channels=cfg.get("hidden_size", 256) * 4,
        n_heads=cfg.get("num_heads", 2),
        n_layers=cfg.get("enc_layers", 4),
        kernel_size=cfg.get("enc_ffn_kernel_size", 5),
        p_dropout=cfg.get("dropout", 0.1),
    )


@register_decoder("fft")
def _fft_decoder(cfg):
    class FFTDecoder(nn.Module):
        @nn.compact
        def __call__(self, x, nonpadding, deterministic=True):
            return FFTBlocks(
                cfg.get("hidden_size", 256), cfg.get("dec_layers", 4),
                cfg.get("dec_ffn_kernel_size", 9), cfg.get("num_heads", 2),
                cfg.get("dropout", 0.1),
            )(x, nonpadding, deterministic)

    return FFTDecoder()


@register_decoder("conv")
def _conv_decoder(cfg):
    class ConvDecoder(nn.Module):
        @nn.compact
        def __call__(self, x, nonpadding, deterministic=True):
            H = cfg.get("hidden_size", 256)
            mask = nonpadding[:, :, None]
            for i in range(cfg.get("dec_layers", 4)):
                res = x
                x = nn.Conv(H, (cfg.get("dec_ffn_kernel_size", 9),), padding="SAME", name=f"conv_{i}")(x * mask)
                x = nn.relu(x)
                x = LayerNorm(name=f"ln_{i}")(x)
                x = nn.Dropout(cfg.get("dropout", 0.1))(x, deterministic=deterministic)
                x = (x + res) * mask
            return x

    return ConvDecoder()


@register_decoder("wn")
def _wn_decoder(cfg):
    class WNDecoder(nn.Module):
        @nn.compact
        def __call__(self, x, nonpadding, deterministic=True):
            return WN(
                cfg.get("hidden_size", 256), kernel_size=3, dilation_rate=2,
                n_layers=cfg.get("dec_layers", 4),
            )(x, nonpadding[:, :, None], None, deterministic)

    return WNDecoder()


class PitchPredictor(nn.Module):
    """Conv stack predicting (f0, uv) per frame (reference
    tts_modules.py:254-297)."""

    n_chans: int = 384
    n_layers: int = 5
    kernel_size: int = 5
    dropout_rate: float = 0.1
    odim: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.n_layers):
            x = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME", name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = LayerNorm(eps=1e-5, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.odim, name="out")(x)


class EnergyPredictor(nn.Module):
    """Per-frame energy predictor (reference EnergyPredictor,
    tts_modules.py:300-304 — a PitchPredictor with odim=1)."""

    n_chans: int = 384
    n_layers: int = 5
    kernel_size: int = 5
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return PitchPredictor(
            self.n_chans, self.n_layers, self.kernel_size, self.dropout_rate, odim=1
        )(x, deterministic)[..., 0]


def energy_to_coarse(energy: jnp.ndarray, bins: int = 256, max_energy: float = 4.0) -> jnp.ndarray:
    """Frame energy -> coarse bucket ids 1..bins-1 (0 = pad)."""
    ids = jnp.clip(energy / max_energy * (bins - 2), 0, bins - 2).astype(jnp.int32) + 1
    return jnp.where(energy > 0, ids, 0)


def mel_energy(mel: jnp.ndarray) -> jnp.ndarray:
    """[B, T, C] log-mel -> [B, T] frame energy (RMS of the linear mel)."""
    return jnp.sqrt(jnp.mean(jnp.square(jnp.power(10.0, mel)), axis=-1))


class RefEncoder(nn.Module):
    """Reference-mel utterance encoder -> [B, C] embedding (reference
    RefEncoder, tts_modules.py:593-652, 'ln' norm variant): strided conv
    stack with LayerNorm+ReLU+dropout, time mean, linear projection.

    hidden_stride_kernel: ("filters,stride,kernel", ...) like the reference
    config strings; filters 0 = out_channels."""

    out_channels: int = 192
    hidden_stride_kernel: tuple = ("0,3,5", "0,3,5", "0,2,5", "0,2,5", "0,2,5")
    dropout: float = 0.1

    @nn.compact
    def __call__(self, mel, deterministic: bool = True):
        from dicttts_tpu.models.layers import LayerNorm

        x = mel  # [B, T, C_mel]
        for i, fsk in enumerate(self.hidden_stride_kernel):
            filters, stride, kernel = (int(v) for v in fsk.split(","))
            filters = filters or self.out_channels
            x = nn.Conv(filters, (kernel,), strides=(stride,),
                        padding=kernel // 2, name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = LayerNorm(name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = jnp.mean(x, axis=1)  # [B, C]
        return nn.Dense(self.out_channels, name="proj")(x)


class FastSpeech2(nn.Module):
    n_vocab: int
    hidden_size: int = 256
    out_dims: int = 80
    encoder_type: str = "fft"
    decoder_type: str = "fft"
    enc_layers: int = 4
    dec_layers: int = 4
    enc_ffn_kernel_size: int = 9
    dec_ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1
    dur_predictor_layers: int = 2
    dur_predictor_kernel: int = 3
    predictor_hidden: int = -1
    predictor_dropout: float = 0.5
    predictor_kernel: int = 5
    predictor_grad: float = 0.1
    use_pitch_embed: bool = True
    use_uv: bool = True
    pitch_norm: str = "log"
    use_energy_embed: bool = False
    use_ref_enc: bool = False
    num_spk: int = 0
    frames_multiple: int = 1

    def setup(self):
        cfg = {
            "n_vocab": self.n_vocab,
            "hidden_size": self.hidden_size,
            "enc_layers": self.enc_layers,
            "dec_layers": self.dec_layers,
            "enc_ffn_kernel_size": self.enc_ffn_kernel_size,
            "dec_ffn_kernel_size": self.dec_ffn_kernel_size,
            "num_heads": self.num_heads,
            "dropout": self.dropout,
        }
        self.encoder = FS_ENCODERS[self.encoder_type](cfg)
        self.decoder = FS_DECODERS[self.decoder_type](cfg)
        self.mel_head = nn.Dense(self.out_dims)
        ph = self.predictor_hidden if self.predictor_hidden > 0 else self.hidden_size
        self.dur_predictor = DurationPredictor(
            n_chans=ph,
            n_layers=self.dur_predictor_layers,
            kernel_size=self.dur_predictor_kernel,
            dropout_rate=self.predictor_dropout,
        )
        if self.use_pitch_embed:
            self.pitch_embed = nn.Embed(300, self.hidden_size)
            self.pitch_predictor = PitchPredictor(
                n_chans=ph, kernel_size=self.predictor_kernel
            )
        if self.use_energy_embed:
            self.energy_embed = nn.Embed(256, self.hidden_size)
            self.energy_predictor = EnergyPredictor(n_chans=ph, kernel_size=self.predictor_kernel)
        if self.use_ref_enc:
            self.ref_encoder = RefEncoder(out_channels=self.hidden_size, dropout=self.dropout)
        if self.num_spk > 0:
            self.spk_embed_proj = nn.Embed(self.num_spk, self.hidden_size)

    def __call__(
        self,
        txt_tokens: jnp.ndarray,  # [B, T_txt]
        mel2ph: Optional[jnp.ndarray] = None,  # [B, T_mel]
        spk_ids: Optional[jnp.ndarray] = None,
        f0: Optional[jnp.ndarray] = None,  # [B, T_mel] normalized
        uv: Optional[jnp.ndarray] = None,  # [B, T_mel]
        energy: Optional[jnp.ndarray] = None,  # [B, T_mel]
        ref_mels: Optional[jnp.ndarray] = None,  # [B, T_ref, C] for RefEncoder
        infer: bool = False,
        max_frames: Optional[int] = None,
        deterministic: bool = True,
    ) -> dict:
        ret: dict = {}
        enc = self.encoder(txt_tokens, deterministic=deterministic)
        src_nonpadding = (txt_tokens > 0).astype(jnp.float32)[:, :, None]
        spk = (
            self.spk_embed_proj(spk_ids)[:, None, :]
            if (self.num_spk > 0 and spk_ids is not None)
            else 0.0
        )
        if self.use_ref_enc and ref_mels is not None:
            spk = spk + self.ref_encoder(ref_mels, deterministic)[:, None, :]

        # duration
        dur_inp = (enc + spk) * src_nonpadding
        dur_inp = jax.lax.stop_gradient(dur_inp) + self.predictor_grad * (
            dur_inp - jax.lax.stop_gradient(dur_inp)
        )
        dur = self.dur_predictor(dur_inp, src_nonpadding[:, :, 0], deterministic)
        ret["dur"] = dur
        if mel2ph is None:
            assert max_frames is not None
            dur_frames = DurationPredictor.out2dur(dur) * (txt_tokens > 0)
            mel2ph = length_regulate(dur_frames, max_frames, (txt_tokens > 0))
        ret["mel2ph"] = mel2ph
        tgt_nonpadding = (mel2ph > 0).astype(jnp.float32)[:, :, None]
        decoder_inp = gather_expand(enc, mel2ph)

        # pitch
        if self.use_pitch_embed:
            pitch_inp = (decoder_inp + spk) * tgt_nonpadding
            pitch_inp = jax.lax.stop_gradient(pitch_inp) + self.predictor_grad * (
                pitch_inp - jax.lax.stop_gradient(pitch_inp)
            )
            pitch_pred = self.pitch_predictor(pitch_inp, deterministic)
            ret["pitch_pred"] = pitch_pred
            if f0 is None:
                f0 = pitch_pred[:, :, 0]
                uv = (pitch_pred[:, :, 1] > 0).astype(jnp.float32) if self.use_uv else None
            f0_denorm = denorm_f0(
                f0, uv if self.use_uv else None, self.pitch_norm, pitch_padding=mel2ph == 0
            )
            ret["f0_denorm"] = f0_denorm
            decoder_inp = decoder_inp + self.pitch_embed(f0_to_coarse(f0_denorm))

        # energy (reference EnergyPredictor path; optional)
        if self.use_energy_embed:
            energy_inp = (decoder_inp + spk) * tgt_nonpadding
            energy_inp = jax.lax.stop_gradient(energy_inp) + self.predictor_grad * (
                energy_inp - jax.lax.stop_gradient(energy_inp)
            )
            energy_pred = self.energy_predictor(energy_inp, deterministic)
            ret["energy_pred"] = energy_pred
            if energy is None:
                energy = energy_pred
            decoder_inp = decoder_inp + self.energy_embed(energy_to_coarse(energy))

        decoder_inp = (decoder_inp + spk) * tgt_nonpadding
        ret["decoder_inp"] = decoder_inp
        x = self.decoder(decoder_inp, tgt_nonpadding[:, :, 0], deterministic=deterministic)
        ret["mel_out"] = self.mel_head(x) * tgt_nonpadding
        return ret
