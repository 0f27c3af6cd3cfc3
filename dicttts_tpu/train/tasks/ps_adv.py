"""PortaSpeech adversarial task (reference tasks/tts/ps_adv.py): the
ps_flow objective (KL + mel + word-dur) plus the multi-window mel
discriminator, two optimizers in one jitted step."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dicttts_tpu.models.portaspeech import PortaSpeech
from dicttts_tpu.train import losses as L
from dicttts_tpu.train.tasks.adv_base import AdversarialTTSTask


class PortaSpeechAdvTask(AdversarialTTSTask):
    def __init__(self, cfg, data=None):
        self._init_adv(cfg)
        self.data = data
        self.mel_loss_spec = L.parse_mel_loss_spec(cfg.get("mel_loss", "ssim:0.5|l1:0.5"))
        self.lambda_kl = cfg.get("lambda_kl", 1.0)
        self.kl_min = cfg.get("kl_min", 0.002)
        self.infer_max_frames = cfg.get("max_frames", 1548)
        self.word_len = cfg.get("_init_max_words", 128)
        self.model = PortaSpeech(
            n_vocab=cfg.get("n_vocab", cfg.get("word_size", 8000)),
            hidden_size=cfg.get("hidden_size", 192),
            num_heads=cfg.get("num_heads", 2),
            enc_layers=cfg.get("enc_layers", 4),
            word_enc_layers=cfg.get("word_enc_layers", 4),
            enc_ffn_kernel_size=cfg.get("enc_ffn_kernel_size", 5),
            dropout=cfg.get("dropout", 0.1),
            dur_predictor_layers=cfg.get("dur_predictor_layers", 3),
            dur_predictor_kernel=cfg.get("dur_predictor_kernel", 5),
            predictor_dropout=cfg.get("predictor_dropout", 0.2),
            predictor_grad=cfg.get("predictor_grad", 0.1),
            frames_multiple=cfg.get("frames_multiple", 4),
            out_dims=cfg.get("audio_num_mel_bins", 80),
            latent_size=cfg.get("latent_size", 16),
            fvae_enc_dec_hidden=cfg.get("fvae_enc_dec_hidden", 192),
            fvae_kernel_size=cfg.get("fvae_kernel_size", 5),
            fvae_enc_n_layers=cfg.get("fvae_enc_n_layers", 8),
            fvae_dec_n_layers=cfg.get("fvae_dec_n_layers", 4),
            use_prior_flow=cfg.get("use_prior_glow", True),
            prior_flow_hidden=cfg.get("prior_glow_hidden", 64),
            prior_flow_kernel_size=cfg.get("glow_kernel_size", 3),
            prior_flow_n_blocks=cfg.get("prior_glow_n_blocks", 4),
            num_spk=cfg.get("num_spk", 0) if cfg.get("use_spk_id") else 0,
        )

    def build_state(self, rng) -> dict:
        Tph, Tm, W = 8, 32, 4
        r1, r2, r3 = jax.random.split(rng, 3)
        params_g = self.model.init(
            {"params": r1, "sample": r2},
            jnp.ones((1, Tph), jnp.int32),
            jnp.ones((1, Tph), jnp.int32),
            W,
            mel2word=jnp.ones((1, Tm), jnp.int32),
            spk_ids=jnp.zeros((1,), jnp.int32) if self.model.num_spk > 0 else None,
            tgt_mels=jnp.zeros((1, Tm, 80)),
        )["params"]
        params_d = self._init_disc_params(r3)
        return self.attach_device_frame_cache({
            "params_g": params_g,
            "params_d": params_d,
            "opt_g": self.tx_g.init(params_g),
            "opt_d": self.tx_d.init(params_d),
            "step": jnp.zeros((), jnp.int32),
        })

    def _run_model(self, params_g, batch, rng, train: bool, infer: bool = False):
        rngs = {"sample": jax.random.fold_in(rng, 0), "dropout": jax.random.fold_in(rng, 1)}
        return self.model.apply(
            {"params": params_g},
            batch["txt_tokens"],
            batch["ph2word"],
            batch["word_tokens"].shape[1] if "word_tokens" in batch else self.word_len,
            mel2word=None if infer else batch["mel2word"],
            spk_ids=batch.get("spk_ids"),
            tgt_mels=batch.get("mels"),
            infer=infer,
            max_frames=self.infer_max_frames if infer else None,
            deterministic=not train,
            rngs=rngs,
        )

    def _gen_losses(self, params_g, params_d, batch, rng, train: bool, adv_w=1.0):
        out = self._run_model(params_g, batch, rng, train)
        losses = {"kl": L.clamp_kl(out["kl"] * self.lambda_kl, self.kl_min)}
        L.add_mel_losses(self.mel_loss_spec, out["mel_out"], batch["mels"], losses)
        losses["wdur"] = L.word_dur_loss(
            out["dur"], batch["mel2word"], batch["word_lengths"], self.cfg.get("dur_scale", "log")
        )
        if train and self.lambda_adv > 0:
            losses["a"] = (
                self._adv_gen_loss(params_d, out["mel_out"], batch["mel_lengths"], rng)
                * self.lambda_adv
                * adv_w
            )
        return sum(losses.values()), (losses, out)

    def test_step(self, state, batch, rng):
        batch = self.prepare_batch(state, batch)
        with self._amp_scope():
            out = self._run_model(state["params_g"], batch, rng, train=False, infer=True)
        return {"mel_out": out["mel_out"], "mel2word": out["mel2word"], "attn": out["attn"]}
