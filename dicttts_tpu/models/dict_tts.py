"""Dict-TTS acoustic model: DictEncoder (S2PA) + word-level duration +
length regulation + semantics-conditioned FVAE mel decoder.

Capability parity with the reference PortaSpeech_dict
(/root/reference/modules/dict_tts/model.py:14-122): the ph/word encoders of
PortaSpeech are replaced by the DictEncoder; duration is predicted at word
(character) level in log scale with straight-through predictor_grad mixing;
word states are gathered to frames through the mel2word map (padded to
frames_multiple); the FVAE decodes with the gathered states as conditioning
(the reference's 'synta' semantics input is all-zeros in the released model,
model.py:92 — kept as an optional input here).

Static-shape discipline: at inference the predicted durations are expanded
to a fixed `max_frames` and masked, instead of the reference's dynamic
length (SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.dict_encoder import DictEncoder, DictMsg
from dicttts_tpu.models.duration import DurationPredictor
from dicttts_tpu.models.fvae import FVAE
from dicttts_tpu.ops.seq import gather_expand, length_regulate, pad_frames_multiple


class DictTTS(nn.Module):
    word_vocab: int
    hidden_size: int = 192
    num_heads: int = 2
    enc_ffn_kernel_size: int = 5
    dropout: float = 0.1
    pinyin_vocab: int = 185
    # duration predictor
    dur_predictor_layers: int = 3
    dur_predictor_kernel: int = 5
    dur_predictor_chans: int = 128  # reference hardcodes n_chans=128 (model.py:164-166)
    predictor_dropout: float = 0.2
    predictor_grad: float = 0.1
    frames_multiple: int = 4
    # fvae
    out_dims: int = 80
    latent_size: int = 16
    fvae_enc_dec_hidden: int = 192
    fvae_kernel_size: int = 5
    fvae_enc_n_layers: int = 8
    fvae_dec_n_layers: int = 4
    use_prior_flow: bool = True
    prior_flow_hidden: int = 64
    prior_flow_kernel_size: int = 3
    prior_flow_n_blocks: int = 4
    fvae_strides: int = 4
    # speaker conditioning
    num_spk: int = 0  # 0 = single speaker
    use_pallas_s2pa: bool = False
    # 'token' (released) | 'sense' | 'gumbel' — see dict_encoder.sense_remap_grouped
    s2pa_sense_mode: str = "token"
    # static sense-axis bound for the grouped modes; must cover the bank's
    # key_map.max() (binarizer asserts at bank-build time)
    s2pa_max_senses: int = 10

    def setup(self):
        self.dict_encoder = DictEncoder(
            self.word_vocab,
            self.hidden_size,
            self.num_heads,
            self.enc_ffn_kernel_size,
            self.dropout,
            self.pinyin_vocab,
            self.use_pallas_s2pa,
            self.s2pa_sense_mode,
            self.s2pa_max_senses,
        )
        self.dur_predictor = DurationPredictor(
            n_chans=self.dur_predictor_chans,
            n_layers=self.dur_predictor_layers,
            kernel_size=self.dur_predictor_kernel,
            dropout_rate=self.predictor_dropout,
            softplus_out=True,  # PortaSpeech-family head (model.py:56)
        )
        self.fvae = FVAE(
            in_out_channels=self.out_dims,
            hidden_channels=self.fvae_enc_dec_hidden,
            latent_size=self.latent_size,
            kernel_size=self.fvae_kernel_size,
            enc_n_layers=self.fvae_enc_n_layers,
            dec_n_layers=self.fvae_dec_n_layers,
            gin_channels=self.hidden_size,
            strides=(self.fvae_strides,),
            use_prior_flow=self.use_prior_flow,
            flow_hidden=self.prior_flow_hidden,
            flow_kernel_size=self.prior_flow_kernel_size,
            flow_n_steps=self.prior_flow_n_blocks,
        )
        if self.num_spk > 0:
            self.spk_embed_proj = nn.Embed(self.num_spk, self.hidden_size)

    def __call__(
        self,
        word_tokens: jnp.ndarray,  # [B, T_w]
        dict_msg: DictMsg,
        pron_modified: Optional[jnp.ndarray] = None,  # [B, T_w]
        mel2word: Optional[jnp.ndarray] = None,  # [B, T_mel] (None => predict)
        spk_ids: Optional[jnp.ndarray] = None,  # [B]
        tgt_mels: Optional[jnp.ndarray] = None,  # [B, T_mel, 80]
        infer: bool = False,
        max_frames: Optional[int] = None,
        deterministic: bool = True,
        noise_scale: float = 1.0,
    ) -> dict:
        ret: dict = {}
        nonpadding = (word_tokens > 0).astype(jnp.float32)  # [B, T_w]

        x, dict_attn, pron_attn, context = self.dict_encoder(
            word_tokens, dict_msg, pron_modified, deterministic
        )
        ret["dict_attn"], ret["pron_attn"] = dict_attn, pron_attn
        if self.num_spk > 0 and spk_ids is not None:
            x = x + self.spk_embed_proj(spk_ids)[:, None, :]
        ret["word_encoder_out"] = x

        # duration (log scale, word level), straight-through predictor_grad mix
        dur_input = (
            jax.lax.stop_gradient(x) + self.predictor_grad * (x - jax.lax.stop_gradient(x))
        ) * nonpadding[:, :, None]
        dur = self.dur_predictor(dur_input, nonpadding, deterministic)
        ret["dur"] = dur
        if mel2word is None:
            assert max_frames is not None, "inference needs a static max_frames"
            dur_frames = DurationPredictor.out2dur(dur) * nonpadding.astype(jnp.int32)
            mel2word = length_regulate(dur_frames, max_frames, nonpadding)
            mel2word = pad_frames_multiple(mel2word, self.frames_multiple)
        tgt_nonpadding = (mel2word > 0).astype(jnp.float32)[:, :, None]
        ret["mel2word"] = mel2word
        ret["x_mask"] = tgt_nonpadding

        # gather word states to frames (mask in the activation dtype so a
        # bf16 encoder output doesn't silently promote the FVAE path to f32)
        g = gather_expand(x, mel2word) * tgt_nonpadding.astype(x.dtype)
        ret["decoder_inp"] = g

        if infer:
            mel_out, z_p = self.fvae(
                x_mask=tgt_nonpadding, g=g, infer=True,
                deterministic=deterministic, noise_scale=noise_scale,
            )
            ret["z_p"] = z_p
        else:
            mel_out, ret["kl"], ret["z_p"], ret["m_q"], ret["logs_q"] = self.fvae(
                x=tgt_mels, x_mask=tgt_nonpadding, g=g, infer=False,
                deterministic=deterministic, noise_scale=noise_scale,
            )
        # mel output and everything downstream (losses, disc) stay f32
        ret["mel_out"] = ret["mel_out_fvae"] = mel_out.astype(jnp.float32) * tgt_nonpadding
        return ret
