"""FastSpeech2 task (reference tasks/tts/fs2.py): mel + duration (ph level,
MSE on log durations) + pitch (f0 MSE + uv BCE) losses, single AdamW+RSQRT
optimizer, one jitted step."""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import optax

from dicttts_tpu.models.fastspeech2 import FastSpeech2
from dicttts_tpu.ops.amp import amp_scope, task_activation_dtype
from dicttts_tpu.ops.seq import mel2token_to_dur
from dicttts_tpu.train import losses as L
from dicttts_tpu.train.tasks.adv_base import upcast_transfer_dtypes
from dicttts_tpu.utils.schedulers import rsqrt_schedule


class FastSpeech2Task:
    def __init__(self, cfg, data=None):
        self.cfg = cfg
        self.data = data
        if cfg.get("use_device_frame_cache"):
            # the train provider emits item_idx-only batches under this
            # flag, and this task has no cache-resolution hook (it lives in
            # AdversarialTTSTask.prepare_batch) — fail at construction, not
            # with a KeyError inside jit
            raise ValueError(
                "use_device_frame_cache is not supported by FastSpeech2Task"
            )
        # amp: bf16 matmul policy + bf16 activations through the FFT
        # encoder/decoder blocks (fft_blocks.py reads cdtype()); predictor
        # glue, masks and losses stay f32 via flax dtype promotion
        self.matmul_precision = "bfloat16" if cfg.get("amp") else None
        self.act_dtype = task_activation_dtype(cfg)
        self.mel_loss_spec = L.parse_mel_loss_spec(cfg.get("mel_loss", "l1"))
        self.lambda_dur = cfg.get("lambda_dur", 1.0)
        self.lambda_pitch = cfg.get("lambda_pitch", 1.0)
        self.use_pitch = cfg.get("use_pitch_embed", True)
        self.use_uv = cfg.get("use_uv", True)
        self.infer_max_frames = cfg.get("max_frames", 1548)
        self.model = FastSpeech2(
            n_vocab=cfg.get("n_vocab", 100),
            hidden_size=cfg.get("hidden_size", 256),
            out_dims=cfg.get("audio_num_mel_bins", 80),
            encoder_type=cfg.get("encoder_type", "fft"),
            decoder_type=cfg.get("decoder_type", "fft"),
            enc_layers=cfg.get("enc_layers", 4),
            dec_layers=cfg.get("dec_layers", 4),
            enc_ffn_kernel_size=cfg.get("enc_ffn_kernel_size", 9),
            dec_ffn_kernel_size=cfg.get("dec_ffn_kernel_size", 9),
            num_heads=cfg.get("num_heads", 2),
            dropout=cfg.get("dropout", 0.1),
            dur_predictor_layers=cfg.get("dur_predictor_layers", 2),
            dur_predictor_kernel=cfg.get("dur_predictor_kernel", 3),
            predictor_hidden=cfg.get("predictor_hidden", -1),
            predictor_dropout=cfg.get("predictor_dropout", 0.5),
            predictor_kernel=cfg.get("predictor_kernel", 5),
            predictor_grad=cfg.get("predictor_grad", 0.1),
            use_pitch_embed=self.use_pitch,
            use_uv=self.use_uv,
            pitch_norm=cfg.get("pitch_norm", "log"),
            num_spk=cfg.get("num_spk", 0) if cfg.get("use_spk_id") else 0,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.get("clip_grad_norm", 1.0)),
            optax.adamw(
                rsqrt_schedule(
                    cfg.get("lr", 2.0), cfg.get("warmup_updates", 8000), cfg.get("hidden_size", 256)
                ),
                b1=cfg.get("optimizer_adam_beta1", 0.9),
                b2=cfg.get("optimizer_adam_beta2", 0.98),
                weight_decay=cfg.get("weight_decay", 0.0),
            ),
        )

    def build_state(self, rng):
        tokens = jnp.ones((1, 8), jnp.int32)
        mel2ph = jnp.ones((1, 16), jnp.int32)
        params = self.model.init(
            rng, tokens, mel2ph, f0=jnp.zeros((1, 16)), uv=jnp.zeros((1, 16))
        )["params"]
        return {"params_g": params, "opt_g": self.tx.init(params), "step": jnp.zeros((), jnp.int32)}

    def _losses(self, params, batch, rng, train: bool):
        out = self.model.apply(
            {"params": params},
            batch["txt_tokens"],
            batch["mel2ph"],
            spk_ids=batch.get("spk_ids"),
            f0=batch.get("f0"),
            uv=batch.get("uv"),
            deterministic=not train,
            rngs={"dropout": jax.random.fold_in(rng, 0)},
        )
        losses: dict = {}
        L.add_mel_losses(self.mel_loss_spec, out["mel_out"], batch["mels"], losses)
        # ph-level duration: MSE on log(dur+1) over real tokens
        T = out["dur"].shape[1]
        nonpadding = (batch["txt_tokens"] > 0).astype(jnp.float32)
        dur_gt = jnp.log(mel2token_to_dur(batch["mel2ph"], T).astype(jnp.float32) + 1.0)
        losses["pdur"] = (
            jnp.sum(jnp.square(out["dur"] - dur_gt) * nonpadding)
            / jnp.maximum(jnp.sum(nonpadding), 1.0)
            * self.lambda_dur
        )
        if self.use_pitch:
            mel_nonpadding = (batch["mel2ph"] > 0).astype(jnp.float32)
            p_pred = out["pitch_pred"]
            losses["uv"] = (
                jnp.sum(
                    optax.sigmoid_binary_cross_entropy(p_pred[:, :, 1], batch["uv"]) * mel_nonpadding
                )
                / jnp.maximum(jnp.sum(mel_nonpadding), 1.0)
                * self.lambda_pitch
            )
            f0_nonpadding = mel_nonpadding * (1 - batch["uv"])
            losses["f0"] = (
                jnp.sum(jnp.square(p_pred[:, :, 0] - batch["f0"]) * f0_nonpadding)
                / jnp.maximum(jnp.sum(f0_nonpadding), 1.0)
                * self.lambda_pitch
            )
        return sum(losses.values()), losses

    def train_step(self, state, batch, rng):
        batch = upcast_transfer_dtypes(batch)
        with amp_scope(self.matmul_precision, self.act_dtype):
            (loss, losses), grads = jax.value_and_grad(self._losses, has_aux=True)(
                state["params_g"], batch, rng, True
            )
        updates, opt = self.tx.update(grads, state["opt_g"], state["params_g"])
        params = optax.apply_updates(state["params_g"], updates)
        losses["total_loss"] = loss
        return {"params_g": params, "opt_g": opt, "step": state["step"] + 1}, losses

    def val_step(self, state, batch, rng):
        with amp_scope(self.matmul_precision, self.act_dtype):
            loss, losses = self._losses(state["params_g"], upcast_transfer_dtypes(batch), rng, False)
        losses["total_loss"] = loss
        return losses

    def test_step(self, state, batch, rng):
        with amp_scope(self.matmul_precision, self.act_dtype):
            out = self.model.apply(
                {"params": state["params_g"]},
                batch["txt_tokens"],
                infer=True,
                max_frames=self.infer_max_frames,
            )
        return {"mel_out": out["mel_out"], "mel2ph": out["mel2ph"]}

    def train_batches(self) -> Iterable[dict]:
        return self.data.train_batches()

    def val_batches(self) -> Iterable[dict]:
        return self.data.val_batches()

    def test_batches(self) -> Iterable[dict]:
        return self.data.test_batches()
