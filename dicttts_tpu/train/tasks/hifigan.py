"""HiFi-GAN vocoder training task: one jitted GAN step.

Capability parity with /root/reference/tasks/vocoder/hifigan.py:52-106 and
vocoder_base.py: optimizer 0 (generator) = lambda_mel(5.0) * L1 on the
GAN-side ln-mel of real vs generated wav + LSGAN adversarial (MPD + MSD,
gated by disc_start_steps) [+ optional feature-matching and multi-res STFT];
optimizer 1 = MPD/MSD real-vs-fake MSE. AdamW(b1=0.8, b2=0.99, lr 2e-4)
with StepLR(600, 0.999) on both. Batches: random max_samples(8192) wav
crops with matching mel windows (tasks/vocoder/dataset_utils.py:92-151).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import optax

from dicttts_tpu.models.hifigan import (
    HifiGanGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_adv_loss,
    generator_adv_loss,
)
from dicttts_tpu.ops.amp import amp_scope, cast_params, task_activation_dtype
from dicttts_tpu.ops.mel import gan_log_mel
from dicttts_tpu.train.losses import feature_matching_loss
from dicttts_tpu.train.stft_loss import multi_resolution_stft_loss
from dicttts_tpu.utils.schedulers import step_decay_schedule


class HifiGanTask:
    def __init__(self, cfg, data=None):
        self.cfg = cfg
        self.data = data
        # amp: bf16 MXU matmuls + bf16 activations via param-cast-at-use
        # (the G/D conv stacks hold explicit lax.conv params, so the
        # compute dtype follows the cast params). Losses (log-mel L1, STFT,
        # LSGAN, feature matching) always compute in f32.
        self.matmul_precision = "bfloat16" if cfg.get("amp") else None
        self.act_dtype = task_activation_dtype(cfg)
        self.lambda_mel = cfg.get("lambda_mel", 5.0)
        self.lambda_adv = cfg.get("lambda_adv", 1.0)
        self.use_fm = cfg.get("use_fm_loss", False)
        self.use_ms_stft = cfg.get("use_ms_stft", False)
        self.disc_start_steps = cfg.get("disc_start_steps", 40000)
        self.mel_kw = dict(
            sample_rate=cfg.get("audio_sample_rate", 22050),
            n_fft=cfg.get("fft_size", 1024),
            hop=cfg.get("hop_size", 256),
            win_length=cfg.get("win_size", 1024),
            n_mels=cfg.get("audio_num_mel_bins", 80),
            fmin=cfg.get("fmin", 80.0),
            fmax=cfg.get("fmax", 7600.0),
        )
        self.gen = HifiGanGenerator(
            upsample_rates=tuple(cfg.get("upsample_rates", (8, 8, 2, 2))),
            upsample_kernel_sizes=tuple(cfg.get("upsample_kernel_sizes", (16, 16, 4, 4))),
            upsample_initial_channel=cfg.get("upsample_initial_channel", 512),
            resblock_kernel_sizes=tuple(cfg.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock=str(cfg.get("resblock", "1")),
        )
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        b1, b2 = cfg.get("adam_b1", 0.8), cfg.get("adam_b2", 0.99)
        g_opt = cfg.get("generator_optimizer_params", {"lr": 2e-4})
        g_sched = cfg.get("generator_scheduler_params", {"step_size": 600, "gamma": 0.999})
        d_opt = cfg.get("discriminator_optimizer_params", {"lr": 2e-4})
        d_sched = cfg.get("discriminator_scheduler_params", {"step_size": 600, "gamma": 0.999})
        self.tx_g = optax.chain(
            optax.clip_by_global_norm(cfg.get("generator_grad_norm", 10.0)),
            optax.adamw(step_decay_schedule(g_opt["lr"], g_sched["step_size"], g_sched["gamma"]), b1=b1, b2=b2),
        )
        self.tx_d = optax.chain(
            optax.clip_by_global_norm(cfg.get("discriminator_grad_norm", 1.0)),
            optax.adamw(step_decay_schedule(d_opt["lr"], d_sched["step_size"], d_sched["gamma"]), b1=b1, b2=b2),
        )

    def build_state(self, rng) -> dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        seg = self.cfg.get("max_samples", 8192)
        mel_len = seg // self.mel_kw["hop"]
        params_g = self.gen.init(r1, jnp.zeros((1, mel_len, self.mel_kw["n_mels"])))["params"]
        params_d = {
            "mpd": self.mpd.init(r2, jnp.zeros((1, seg)))["params"],
            "msd": self.msd.init(r3, jnp.zeros((1, seg)))["params"],
        }
        return {
            "params_g": params_g,
            "params_d": params_d,
            "opt_g": self.tx_g.init(params_g),
            "opt_d": self.tx_d.init(params_d),
            "step": jnp.zeros((), jnp.int32),
        }

    def _disc_scores(self, params_d, wav):
        # discriminators run in the activation dtype; scores/fmaps return
        # f32 so every loss reduction stays full precision
        params_d = cast_params(params_d, self.act_dtype)
        if self.act_dtype is not None:
            wav = wav.astype(self.act_dtype)
        s_p, f_p = self.mpd.apply({"params": params_d["mpd"]}, wav)
        s_s, f_s = self.msd.apply({"params": params_d["msd"]}, wav)
        to32 = lambda t: jax.tree.map(lambda x: x.astype(jnp.float32), t)
        return to32(s_p + s_s), to32(f_p + f_s)

    def _gen_losses(self, params_g, params_d, batch, step, train: bool):
        mels = batch["mels"]
        if self.act_dtype is not None:
            mels = mels.astype(self.act_dtype)
        wav_fake = self.gen.apply(
            {"params": cast_params(params_g, self.act_dtype)}, mels
        ).astype(jnp.float32)
        wav_real = batch["wavs"]
        losses = {
            "mel": self.lambda_mel
            * jnp.mean(jnp.abs(gan_log_mel(wav_fake, **self.mel_kw) - gan_log_mel(wav_real, **self.mel_kw)))
        }
        disc_on = (step >= self.disc_start_steps).astype(jnp.float32) if hasattr(step, "astype") else float(step >= self.disc_start_steps)
        if train:
            scores_f, fmaps_f = self._disc_scores(params_d, wav_fake)
            losses["a"] = generator_adv_loss(scores_f) * self.lambda_adv * disc_on
            if self.use_fm:
                _, fmaps_r = self._disc_scores(params_d, wav_real)
                losses["fm"] = feature_matching_loss(fmaps_r, fmaps_f) * disc_on
        if self.use_ms_stft:
            sc, mag = multi_resolution_stft_loss(wav_real, wav_fake)
            losses["sc"], losses["mag"] = sc, mag
        return sum(losses.values()), (losses, wav_fake)

    def _disc_losses(self, params_d, wav_fake, wav_real):
        scores_r, _ = self._disc_scores(params_d, wav_real)
        scores_f, _ = self._disc_scores(params_d, wav_fake)
        return discriminator_adv_loss(scores_r, scores_f)

    def train_step(self, state, batch, rng):
        with amp_scope(self.matmul_precision, None):
            return self._train_step_inner(state, batch, rng)

    def _train_step_inner(self, state, batch, rng):
        step = state["step"]
        (loss_g, (g_losses, wav_fake)), grads_g = jax.value_and_grad(self._gen_losses, has_aux=True)(
            state["params_g"], state["params_d"], batch, step, True
        )
        updates, opt_g = self.tx_g.update(grads_g, state["opt_g"], state["params_g"])
        params_g = optax.apply_updates(state["params_g"], updates)

        wav_fake = jax.lax.stop_gradient(wav_fake)
        loss_d, grads_d = jax.value_and_grad(self._disc_losses)(
            state["params_d"], wav_fake, batch["wavs"]
        )
        disc_on = step >= self.disc_start_steps
        grads_d = jax.tree.map(lambda g: g * disc_on.astype(g.dtype), grads_d)
        updates_d, opt_d = self.tx_d.update(grads_d, state["opt_d"], state["params_d"])
        updates_d = jax.tree.map(lambda u: u * disc_on.astype(u.dtype), updates_d)
        params_d = optax.apply_updates(state["params_d"], updates_d)
        # freeze the disc optimizer (moments + StepLR count) until it actually
        # trains — the reference skips optimizer.step entirely while the task
        # returns None for the disc (utils/trainer.py:281-286)
        opt_d = jax.tree.map(lambda n, o: jnp.where(disc_on, n, o), opt_d, state["opt_d"])
        new_state = {
            "params_g": params_g, "params_d": params_d,
            "opt_g": opt_g, "opt_d": opt_d, "step": step + 1,
        }
        return new_state, {**g_losses, "total_loss": loss_g, "disc_loss": loss_d}

    def val_step(self, state, batch, rng):
        with amp_scope(self.matmul_precision, None):
            _, (losses, _) = self._gen_losses(
                state["params_g"], state["params_d"], batch, state["step"], False
            )
        losses["total_loss"] = sum(losses.values())
        return losses

    def test_step(self, state, batch, rng):
        return {"wav_out": self.gen.apply({"params": state["params_g"]}, batch["mels"])}

    def train_batches(self) -> Iterable[dict]:
        return self.data.train_batches()

    def val_batches(self) -> Iterable[dict]:
        return self.data.val_batches()

    def test_batches(self) -> Iterable[dict]:
        return self.data.test_batches()
