"""PortaSpeech baseline acoustic model.

Capability parity with /root/reference/modules/portaspeech/model.py:133-367:
phone-level rel-transformer encoder (prenet) -> word pooling -> FFT word
encoder -> word-level duration (phone durations scatter-summed to words,
model.py:314-317) -> length regulation -> word-to-frame single-head
attention with sinusoidal intra-word positions and a hard word mask
(model.py:239-288) -> FVAE decoder. The broken post-glow import path of the
reference (SURVEY.md §2.11) is intentionally not reproduced; the FVAE prior
flow covers the ps_adv/dict_tts configs that actually run.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dicttts_tpu.models.duration import DurationPredictor
from dicttts_tpu.models.fft_blocks import FFTBlocks, sinusoidal_positions
from dicttts_tpu.models.fvae import FVAE
from dicttts_tpu.models.layers import RelTransformerEncoder
from dicttts_tpu.ops.seq import (
    build_word_mask,
    gather_expand,
    group_hidden_by_segs,
    intra_word_positions,
    length_regulate,
    pad_frames_multiple,
    scatter_sum_by_segs,
)


def sin_pos_embed(positions: jnp.ndarray, dim: int, max_pos: int = 2048) -> jnp.ndarray:
    """Continuous-position sinusoidal embedding: round fractional intra-word
    positions onto the sinusoid table (reference sin_pos over build_pos_embed
    outputs)."""
    table = jnp.asarray(sinusoidal_positions(max_pos, dim, offset=0))
    idx = jnp.clip(jnp.round(positions * 32).astype(jnp.int32), 0, max_pos - 1)
    return table[idx]


class PortaSpeech(nn.Module):
    n_vocab: int
    hidden_size: int = 192
    num_heads: int = 2
    enc_layers: int = 4
    word_enc_layers: int = 4
    enc_ffn_kernel_size: int = 5
    dropout: float = 0.1
    dur_predictor_layers: int = 3
    dur_predictor_kernel: int = 5
    predictor_dropout: float = 0.2
    predictor_grad: float = 0.1
    frames_multiple: int = 4
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
    num_spk: int = 0
    # post-net glow (reference model.py:186-205 + run_post_glow :326-357;
    # upstream's import of it is broken — models/post_glow.py is a WORKING
    # implementation). Config names follow egs_bases/tts/ps_flow.yaml:37-65.
    use_post_glow: bool = False
    post_glow_hidden: int = 192
    post_glow_kernel_size: int = 3
    post_glow_n_blocks: int = 12
    post_glow_n_block_layers: int = 3
    share_wn_layers: int = 4
    sigmoid_scale: bool = False
    use_txt_cond: bool = True
    detach_postflow_input: bool = True
    infer_post_glow: bool = True
    post_noise_scale: float = 0.8

    def setup(self):
        H = self.hidden_size
        self.ph_encoder = RelTransformerEncoder(
            self.n_vocab, H, H * 4, self.num_heads, self.enc_layers,
            self.enc_ffn_kernel_size, self.dropout, prenet=True,
        )
        self.word_encoder = FFTBlocks(
            H, self.word_enc_layers, ffn_kernel_size=1, n_heads=self.num_heads, dropout=self.dropout
        )
        self.enc_pos_proj = nn.Dense(H, use_bias=False)
        self.dec_query_proj = nn.Dense(H, use_bias=False)
        self.dec_res_proj = nn.Dense(H, use_bias=False)
        self.attn_out = nn.Dense(H, use_bias=False)
        self.dur_predictor = DurationPredictor(
            n_chans=128,
            n_layers=self.dur_predictor_layers,
            kernel_size=self.dur_predictor_kernel,
            dropout_rate=self.predictor_dropout,
            softplus_out=True,
        )
        self.fvae = FVAE(
            in_out_channels=self.out_dims,
            hidden_channels=self.fvae_enc_dec_hidden,
            latent_size=self.latent_size,
            kernel_size=self.fvae_kernel_size,
            enc_n_layers=self.fvae_enc_n_layers,
            dec_n_layers=self.fvae_dec_n_layers,
            gin_channels=H,
            strides=(4,),
            use_prior_flow=self.use_prior_flow,
            flow_hidden=self.prior_flow_hidden,
            flow_kernel_size=self.prior_flow_kernel_size,
            flow_n_steps=self.prior_flow_n_blocks,
        )
        if self.num_spk > 0:
            self.spk_embed_proj = nn.Embed(self.num_spk, H)
        if self.use_post_glow:
            from dicttts_tpu.models.post_glow import Glow

            cond_hs = self.out_dims + (H if self.use_txt_cond else 0)
            self.post_flow = Glow(
                in_channels=self.out_dims,
                hidden_channels=self.post_glow_hidden,
                kernel_size=self.post_glow_kernel_size,
                n_blocks=self.post_glow_n_blocks,
                n_block_layers=self.post_glow_n_block_layers,
                n_split=4,
                n_sqz=2,
                gin_channels=cond_hs,
                share_wn_layers=self.share_wn_layers,
                sigmoid_scale=self.sigmoid_scale,
            )

    def _word_frame_attention(self, ph_enc, word_enc, ph2word, mel2word, word2word):
        """Single-head word-to-frame attention (reference model.py:254-288)."""
        H = self.hidden_size
        enc_pos = sin_pos_embed(intra_word_positions(word2word, ph2word), H)  # [B, T_ph, H]
        dec_pos = sin_pos_embed(intra_word_positions(word2word, mel2word), H)  # [B, T_mel, H]
        ph_kv = self.enc_pos_proj(jnp.concatenate([ph_enc, enc_pos], -1))
        word_expand = gather_expand(word_enc, mel2word)
        q_in = jnp.concatenate([word_expand, dec_pos], -1)
        q = self.dec_query_proj(q_in)
        x_res = self.dec_res_proj(q_in)
        word_mask = build_word_mask(mel2word, ph2word).astype(jnp.float32)  # [B, T_mel, T_ph]
        scores = jnp.einsum("bmh,bph->bmp", q, ph_kv) / jnp.sqrt(float(H))
        scores = jnp.where(word_mask == 0, -1e9, scores)
        weights = jax.nn.softmax(scores, axis=-1)
        x = jnp.einsum("bmp,bph->bmh", weights, ph_kv)
        x = self.attn_out(x) + x_res
        return x, weights

    def __call__(
        self,
        txt_tokens: jnp.ndarray,  # [B, T_ph] phone ids
        ph2word: jnp.ndarray,  # [B, T_ph] 1-based word ids
        word_len: int,  # static max word count
        mel2word: Optional[jnp.ndarray] = None,  # [B, T_mel]
        spk_ids: Optional[jnp.ndarray] = None,
        tgt_mels: Optional[jnp.ndarray] = None,
        infer: bool = False,
        max_frames: Optional[int] = None,
        deterministic: bool = True,
    ) -> dict:
        ret: dict = {}
        src_nonpadding = (txt_tokens > 0).astype(jnp.float32)[:, :, None]
        ph_enc = self.ph_encoder(txt_tokens, deterministic=deterministic) * src_nonpadding
        spk = (
            self.spk_embed_proj(spk_ids)[:, None, :]
            if (self.num_spk > 0 and spk_ids is not None)
            else 0.0
        )
        ph_enc = ph_enc + spk

        word_states = group_hidden_by_segs(ph_enc, ph2word, word_len)
        word_nonpadding = (jnp.sum(jnp.abs(word_states), -1) > 0).astype(jnp.float32)
        word_enc = self.word_encoder(word_states, word_nonpadding, deterministic)

        # phone-level duration, summed to words (log domain as the reference)
        dur_inp = jax.lax.stop_gradient(ph_enc) + self.predictor_grad * (
            ph_enc - jax.lax.stop_gradient(ph_enc)
        )
        dur_ph = self.dur_predictor(dur_inp, src_nonpadding[:, :, 0], deterministic)
        dur = scatter_sum_by_segs(dur_ph, ph2word, word_len)
        ret["dur"] = dur
        if mel2word is None:
            assert max_frames is not None
            word_nonpad = (jnp.sum(jnp.abs(word_states), -1) > 0)
            dur_frames = DurationPredictor.out2dur(dur) * word_nonpad
            mel2word = length_regulate(dur_frames, max_frames, word_nonpad)
            mel2word = pad_frames_multiple(mel2word, self.frames_multiple)
        ret["mel2word"] = mel2word
        tgt_nonpadding = (mel2word > 0).astype(jnp.float32)[:, :, None]

        word2word = (1 + jnp.arange(word_len))[None, :] * jnp.ones(
            (txt_tokens.shape[0], 1), jnp.int32
        )
        x, attn = self._word_frame_attention(ph_enc, word_enc, ph2word, mel2word, word2word)
        ret["attn"] = attn
        x = (x + spk) * tgt_nonpadding.astype(x.dtype)
        ret["decoder_inp"] = x

        if infer:
            mel_out, ret["z_p"] = self.fvae(
                x_mask=tgt_nonpadding, g=x, infer=True, deterministic=deterministic
            )
        else:
            mel_out, ret["kl"], ret["z_p"], ret["m_q"], ret["logs_q"] = self.fvae(
                x=tgt_mels, x_mask=tgt_nonpadding, g=x, deterministic=deterministic
            )
        ret["mel_out"] = ret["mel_out_fvae"] = mel_out.astype(jnp.float32) * tgt_nonpadding

        if self.use_post_glow:
            self._run_post_glow(ret, tgt_nonpadding, tgt_mels, infer, deterministic)
        return ret

    def _run_post_glow(self, ret, tgt_nonpadding, tgt_mels, infer, deterministic):
        """Post-net glow (reference run_post_glow, model.py:326-357,
        res_mode=0 / use_g_proj=false as shipped): condition on the FVAE
        reconstruction (+ text encoding), train by exact NLL of the target
        mel, sample at inference by inverting noise."""
        import math as _math

        g = ret["mel_out_fvae"]
        if self.use_txt_cond:
            g = jnp.concatenate([g, ret["decoder_inp"]], axis=-1)
        if self.detach_postflow_input:
            g = jax.lax.stop_gradient(g)
        if not infer:
            z, ldj = self.post_flow(
                tgt_mels, tgt_nonpadding, g, deterministic=deterministic
            )
            frames = jnp.maximum(jnp.sum(tgt_nonpadding, axis=(1, 2)), 1.0)
            ldj = ldj / frames / self.out_dims
            ret["z_pf"], ret["ldj_pf"] = z, ldj
            # -N(0,1).log_prob(z).mean() - ldj.mean()  (model.py:350)
            ret["postflow"] = (
                0.5 * jnp.mean(jnp.square(z)) + 0.5 * _math.log(2 * _math.pi)
                - jnp.mean(ldj)
            )
        elif self.infer_post_glow:
            z = (
                jax.random.normal(self.make_rng("sample"), ret["mel_out"].shape)
                * self.post_noise_scale
            )
            mel_post, _ = self.post_flow(
                z, jnp.ones_like(ret["mel_out"][..., :1]), g, reverse=True
            )
            ret["mel_out"] = mel_post * tgt_nonpadding
