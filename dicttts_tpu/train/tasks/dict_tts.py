"""DictTTS training task: adversarial VAE training with two optimizers.

Capability parity with the reference DictTTSTask / PortaSpeechAdvTask
(/root/reference/tasks/tts/dict_tts.py:24-177, tasks/tts/ps_adv.py:34-78,
230-265), redesigned as ONE jitted train step:

- optimizer 0 (generator = full acoustic model): KL (clamped >= 0.002) *
  lambda_kl + composite mel loss + word-duration loss + LSGAN
  adversarial-to-1 * lambda_mel_adv, AdamW + RSQRT schedule, global-norm
  clip 1;
- optimizer 1 (discriminator): LSGAN real-to-1/fake-to-0 on independent
  random mel crops, AdamW(eps 1e-6) + StepLR(40000, 0.5), clip 1, gated by
  disc_start_steps/disc_interval (gate folded into the jitted step with a
  masked update instead of python branching);
- the discriminator step scores the generator output of the SAME batch
  (detached), like the reference's model_out_gt hand-off.

The task consumes numpy batch dicts with keys: word_tokens [B,Tw],
keys/values [B,Tw,Lk,E], key_map, pinyin, pinyin_map, pron_modified,
mel2word [B,Tm], mels [B,Tm,80], word_lengths [B], mel_lengths [B].
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import optax

from dicttts_tpu.models.dict_encoder import DictMsg
from dicttts_tpu.models.dict_tts import DictTTS
from dicttts_tpu.models.discriminator import MultiWindowDiscriminator
from dicttts_tpu.train import losses as L
from dicttts_tpu.utils.schedulers import rsqrt_schedule, step_decay_schedule


def _dict_msg(batch) -> DictMsg:
    return DictMsg(
        batch["keys"], batch["values"], batch["key_map"], batch["pinyin"], batch["pinyin_map"]
    )


class DictTTSTask:
    def __init__(self, cfg, data=None):
        """cfg: resolved config dict; data: object with train/val/test
        batch-iterator factories (see data.providers)."""
        self.cfg = cfg
        self.data = data
        self.mel_loss_spec = L.parse_mel_loss_spec(cfg.get("mel_loss", "ssim:0.5|l1:0.5"))
        self.lambda_kl = cfg.get("lambda_kl", 1.0)
        self.kl_min = cfg.get("kl_min", 0.002)
        self.lambda_adv = cfg.get("lambda_mel_adv", 0.05)
        self.disc_start_steps = cfg.get("disc_start_steps", 0)
        self.disc_interval = cfg.get("disc_interval", 1)
        self.infer_max_frames = cfg.get("max_frames", 1548)

        self.model = DictTTS(
            word_vocab=cfg.get("word_size", 8000),
            hidden_size=cfg.get("hidden_size", 192),
            num_heads=cfg.get("num_heads", 2),
            enc_ffn_kernel_size=cfg.get("enc_ffn_kernel_size", 5),
            dropout=cfg.get("dropout", 0.1),
            pinyin_vocab=cfg.get("value_embedding_size", 185),
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
        self.disc = MultiWindowDiscriminator(
            time_lengths=tuple([32, 64, 128][: cfg.get("disc_win_num", 3)]),
            freq_length=cfg.get("audio_num_mel_bins", 80),
            hidden_size=cfg.get("mel_disc_hidden_size", 128),
            norm_type=cfg.get("disc_norm", "in"),
            reduction=cfg.get("disc_reduction", "stack"),
        )
        self.tx_g = optax.chain(
            optax.clip_by_global_norm(cfg.get("generator_grad_norm", 1.0)),
            optax.adamw(
                rsqrt_schedule(
                    cfg.get("lr", 1.0),
                    cfg.get("warmup_updates", 8000),
                    cfg.get("hidden_size", 192),
                ),
                b1=cfg.get("optimizer_adam_beta1", 0.9),
                b2=cfg.get("optimizer_adam_beta2", 0.98),
                weight_decay=cfg.get("weight_decay", 0.0),
            ),
        )
        sched = cfg.get("discriminator_scheduler_params", {"step_size": 40000, "gamma": 0.5})
        opt_p = cfg.get("discriminator_optimizer_params", {"eps": 1e-6, "weight_decay": 0.0})
        self.tx_d = optax.chain(
            optax.clip_by_global_norm(cfg.get("discriminator_grad_norm", 1.0)),
            optax.adamw(
                step_decay_schedule(cfg.get("disc_lr", 1e-4), sched["step_size"], sched["gamma"]),
                b1=cfg.get("optimizer_adam_beta1", 0.9),
                b2=cfg.get("optimizer_adam_beta2", 0.98),
                eps=opt_p.get("eps", 1e-6),
                weight_decay=opt_p.get("weight_decay", 0.0),
            ),
        )

    # -- state --------------------------------------------------------------
    def build_state(self, rng) -> dict:
        cfg = self.cfg
        Tw, Tm = cfg.get("_init_tw", 8), cfg.get("_init_tm", 32)
        Lk, Lp = cfg.get("_init_lk", 8), cfg.get("_init_lp", 6)
        E = cfg.get("dict_embed_dim", 768)
        z = jnp.zeros
        dm = DictMsg(
            z((1, Tw, Lk, E)), z((1, Tw, Lk, E)),
            z((1, Tw, Lk), jnp.int32), z((1, Tw, Lp), jnp.int32), z((1, Tw, Lp), jnp.int32),
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        params_g = self.model.init(
            {"params": r1, "sample": r2},
            jnp.ones((1, Tw), jnp.int32), dm, z((1, Tw), jnp.int32),
            mel2word=jnp.ones((1, Tm), jnp.int32), tgt_mels=z((1, Tm, 80)),
        )["params"]
        params_d = self.disc.init(
            {"params": r3}, z((1, 128, 80)), jnp.array([128]), rng=jax.random.PRNGKey(0)
        )["params"]
        return {
            "params_g": params_g,
            "params_d": params_d,
            "opt_g": self.tx_g.init(params_g),
            "opt_d": self.tx_d.init(params_d),
            "step": jnp.zeros((), jnp.int32),
        }

    # -- losses ---------------------------------------------------------------
    def _gen_losses(self, params_g, params_d, batch, rng, train: bool):
        rngs = {"sample": jax.random.fold_in(rng, 0), "dropout": jax.random.fold_in(rng, 1)}
        out = self.model.apply(
            {"params": params_g},
            batch["word_tokens"],
            _dict_msg(batch),
            batch.get("pron_modified"),
            mel2word=batch["mel2word"],
            spk_ids=batch.get("spk_ids"),
            tgt_mels=batch["mels"],
            deterministic=not train,
            rngs=rngs,
        )
        losses = {"kl": L.clamp_kl(out["kl"] * self.lambda_kl, self.kl_min)}
        L.add_mel_losses(self.mel_loss_spec, out["mel_out"], batch["mels"], losses)
        losses["wdur"] = L.word_dur_loss(
            out["dur"], batch["mel2word"], batch["word_lengths"], self.cfg.get("dur_scale", "log")
        )
        if train and self.lambda_adv > 0:
            d_out = self.disc.apply(
                {"params": params_d},
                out["mel_out"],
                batch["mel_lengths"],
                rng=jax.random.fold_in(rng, 2),
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, 3)},
            )
            adv = jnp.mean(
                jnp.square(d_out["y"] - 1.0) * d_out["win_valid"][None, :]
            )
            losses["a"] = adv * self.lambda_adv
        total = sum(losses.values())
        return total, (losses, out)

    def _disc_losses(self, params_d, mel_fake, mel_real, lengths, rng):
        out_r = self.disc.apply(
            {"params": params_d}, mel_real, lengths,
            rng=jax.random.fold_in(rng, 0), deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        out_f = self.disc.apply(
            {"params": params_d}, mel_fake, lengths,
            rng=jax.random.fold_in(rng, 2), deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 3)},
        )
        wv = out_r["win_valid"][None, :]
        loss_r = jnp.mean(jnp.square(out_r["y"] - 1.0) * wv)
        loss_f = jnp.mean(jnp.square(out_f["y"]) * wv)
        return loss_r + loss_f, {"r": loss_r, "f": loss_f}

    # -- steps ----------------------------------------------------------------
    def train_step(self, state, batch, rng):
        rng_g, rng_d = jax.random.split(rng)
        (loss_g, (g_losses, out)), grads_g = jax.value_and_grad(
            self._gen_losses, has_aux=True
        )(state["params_g"], state["params_d"], batch, rng_g, True)
        updates, opt_g = self.tx_g.update(grads_g, state["opt_g"], state["params_g"])
        params_g = optax.apply_updates(state["params_g"], updates)

        mel_fake = jax.lax.stop_gradient(out["mel_out"])
        (loss_d, d_losses), grads_d = jax.value_and_grad(self._disc_losses, has_aux=True)(
            state["params_d"], mel_fake, batch["mels"], batch["mel_lengths"], rng_d
        )
        step = state["step"]
        disc_on = jnp.logical_and(
            jnp.logical_and(step >= self.disc_start_steps, self.lambda_adv > 0),
            (step % self.disc_interval) == 0,
        ).astype(jnp.float32)
        grads_d = jax.tree.map(lambda g: g * disc_on, grads_d)
        updates_d, opt_d = self.tx_d.update(grads_d, state["opt_d"], state["params_d"])
        params_d = optax.apply_updates(state["params_d"], updates_d)

        new_state = {
            "params_g": params_g,
            "params_d": params_d,
            "opt_g": opt_g,
            "opt_d": opt_d,
            "step": step + 1,
        }
        metrics = {**g_losses, **d_losses, "total_loss": loss_g, "disc_loss": loss_d}
        return new_state, metrics

    def val_step(self, state, batch, rng):
        _, (losses, _) = self._gen_losses(
            state["params_g"], state["params_d"], batch, rng, train=False
        )
        losses["total_loss"] = sum(losses.values())
        return losses

    def test_step(self, state, batch, rng):
        """Inference: predicted durations, sampled prior, argmax pinyin ids."""
        out = self.model.apply(
            {"params": state["params_g"]},
            batch["word_tokens"],
            _dict_msg(batch),
            batch.get("pron_modified"),
            infer=True,
            max_frames=self.infer_max_frames,
            rngs={"sample": rng},
        )
        # pron decode for PER scoring (reference dict_tts.py:294-311):
        # argmax over pinyin positions -> pinyin token id per character
        pron_idx = jnp.argmax(out["pron_attn"], axis=-1)  # [B, Tw]
        pinyin_ids = jnp.take_along_axis(batch["pinyin"], pron_idx[:, :, None], axis=2)[..., 0]
        return {
            "mel_out": out["mel_out"],
            "mel2word": out["mel2word"],
            "pron_attn": out["pron_attn"],
            "pinyin_pred": pinyin_ids,
        }

    # -- data ----------------------------------------------------------------
    def train_batches(self) -> Iterable[dict]:
        return self.data.train_batches()

    def val_batches(self) -> Iterable[dict]:
        return self.data.val_batches()

    def test_batches(self) -> Iterable[dict]:
        return self.data.test_batches()
