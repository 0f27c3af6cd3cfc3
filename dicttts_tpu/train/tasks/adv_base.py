"""Shared GAN machinery for acoustic-model tasks with the multi-window mel
discriminator (reference PortaSpeechAdvTask, /root/reference/tasks/tts/
ps_adv.py:34-78,230-265). Subclasses provide the generator model and
`_gen_losses`; this base contributes the discriminator, both optimizers,
and the fused two-optimizer jitted train step."""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import optax

from dicttts_tpu.models.discriminator import MultiWindowDiscriminator
from dicttts_tpu.ops.amp import amp_scope, task_activation_dtype
from dicttts_tpu.utils.schedulers import rsqrt_schedule, step_decay_schedule


def _select_tree(cond, new_tree, old_tree):
    """Per-leaf `where(cond, new, old)` — used to freeze an optimizer state
    (adam moments, schedule counts) when its step is gated off."""
    return jax.tree.map(lambda n, o: jnp.where(cond, n, o), new_tree, old_tree)


def upcast_transfer_dtypes(batch: dict) -> dict:
    """Upcast reduced-precision transfer leaves back to compute dtypes on
    device — float16 (the collater's mel transfer format under amp) to
    float32, int16 (frame-ref alignment arrays) to int32. Runs inside jit,
    so it costs one fused cast, not a second transfer."""
    def up(v):
        if hasattr(v, "dtype"):
            if v.dtype == jnp.float16:
                return v.astype(jnp.float32)
            if v.dtype == jnp.int16:
                return v.astype(jnp.int32)
        return v

    return {k: up(v) for k, v in batch.items()}


class AdversarialTTSTask:
    """Mixin/base: generator + multi-window mel discriminator training."""

    def _init_adv(self, cfg):
        self.cfg = cfg
        # bf16 MXU policy (reference AMP analog): matmuls/convs in bf16 with
        # f32 accumulation + f32 params; flows/KL stay f32 (models/flows.py)
        self.matmul_precision = "bfloat16" if cfg.get("amp") else None
        # true-amp: bf16 ACTIVATIONS through the hot modules (ops/amp.py) —
        # halves HBM traffic vs f32-activations-with-bf16-matmuls
        self.act_dtype = task_activation_dtype(cfg)
        self.lambda_adv = cfg.get("lambda_mel_adv", 0.05)
        self.disc_start_steps = cfg.get("disc_start_steps", 0)
        self.disc_interval = cfg.get("disc_interval", 1)
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
                    cfg.get("lr", 1.0), cfg.get("warmup_updates", 8000), cfg.get("hidden_size", 192)
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
        # gradient accumulation wraps BOTH optimizers (the reference trainer
        # accumulates every optimizer, utils/trainer.py:303,330)
        accum = cfg.get("accumulate_grad_batches", 1)
        if accum > 1:
            self.tx_g = optax.MultiSteps(self.tx_g, every_k_schedule=accum)
            self.tx_d = optax.MultiSteps(self.tx_d, every_k_schedule=accum)

    def _init_disc_params(self, rng):
        return self.disc.init(
            {"params": rng}, jnp.zeros((1, 128, self.cfg.get("audio_num_mel_bins", 80))),
            jnp.array([128]), rng=jax.random.PRNGKey(0),
        )["params"]

    # subclass contract:
    #   _gen_losses(params_g, params_d, batch, rng, train, adv_w=1.0)
    #     -> (total_loss, (losses_dict, model_out_dict with 'mel_out'))
    # adv_w is a traced 0/1 multiplier for the adversarial term: the reference
    # only adds 'a' once global_step > disc_start_steps
    # (tasks/tts/ps_adv.py:61-66), i.e. the generator never trains against a
    # discriminator that has not started training.

    def _adv_gen_loss(self, params_d, mel_pred, mel_lengths, rng):
        """LSGAN-to-1 term added to the generator objective."""
        d_out = self.disc.apply(
            {"params": params_d}, mel_pred, mel_lengths,
            rng=jax.random.fold_in(rng, 2), deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 3)},
        )
        return jnp.mean(jnp.square(d_out["y"] - 1.0) * d_out["win_valid"][None, :])

    def _disc_losses(self, params_d, mel_fake, mel_real, lengths, rng):
        # ONE disc apply over real and fake stacked on the batch axis: the
        # step is op-latency-bound at this geometry (scripts/ablate_fine.py:
        # disc fwd 1.42 ms at B=60 vs 2.34 at B=120), so halving the number
        # of conv dispatches beats two half-sized passes. Crop starts are
        # drawn once and shared between real and fake (the documented
        # intent, models/discriminator.py:9-12 — scoring both on the same
        # window is also the fairer LSGAN comparison).
        B = mel_real.shape[0]
        out = self.disc.apply(
            {"params": params_d},
            jnp.concatenate([mel_real, mel_fake], axis=0),
            jnp.concatenate([lengths, lengths], axis=0),
            rng=jax.random.fold_in(rng, 0), deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        wv = out["win_valid"][None, :]
        loss_r = jnp.mean(jnp.square(out["y"][:B] - 1.0) * wv)
        loss_f = jnp.mean(jnp.square(out["y"][B:]) * wv)
        return loss_r + loss_f, {"r": loss_r, "f": loss_f}

    def _amp_scope(self):
        """Trace-time scope combining the bf16 matmul policy and the bf16
        activation dtype (both no-ops when amp is off)."""
        return amp_scope(self.matmul_precision, self.act_dtype)

    def train_step(self, state, batch, rng):
        with self._amp_scope():
            return self._train_step_inner(state, batch, rng)

    def prepare_batch(self, state, batch):
        """Hook: tasks may attach state-resident constants (e.g. the device
        dict bank) to the batch before the loss closures see it. The base
        implementation resolves frame tensors from the device-resident
        frame cache (use_device_frame_cache: batches carry item_idx; mels
        and f0/uv gather from the [N, T, ...] cache by item id — an HBM
        gather instead of the dominant host->device transfer) and upcasts
        f16 transfer-format leaves to f32."""
        if "_const_frame_cache" in state and "item_idx" in batch:
            batch = dict(batch)
            idx = batch.pop("item_idx")
            cache = state["_const_frame_cache"]
            # the batch's T_mel bucket rides on the host-side alignment
            # array (mel2word for word/dict tasks, mel2ph for ph tasks)
            align = batch.get("mel2word", batch.get("mel2ph"))
            T = align.shape[-1]
            # zero frames at/after each row's mel_lengths: PAD rows (sentence
            # buckets / devices-multiple padding) carry item_idx 0 with
            # mel_lengths 0, and the streamed path ships them as all-zero
            # mels — without this mask the gather hands pad rows item 0's
            # REAL frames, which the nonzero-target loss mask
            # (losses.nonzero_mel_mask, reference weights_nonzero_speech
            # semantics) then counts as supervision: 1-in-epoch ragged
            # batches trained their pad rows toward item 0's mel (l1 spiking
            # to ~1.07 at the 60x512 soak geometry). For real rows the cache
            # is already zero beyond the item's length, so the multiply is
            # bit-exact with the streamed path.
            fmask = (
                jnp.arange(T)[None, :] < batch["mel_lengths"][:, None]
            )
            batch["mels"] = (
                jnp.take(cache["mels"], idx, axis=0)[:, :T]
                * fmask[..., None].astype(cache["mels"].dtype)
            )
            for k in ("f0", "uv"):
                if k in cache:
                    batch[k] = (
                        jnp.take(cache[k], idx, axis=0)[:, :T]
                        * fmask.astype(cache[k].dtype)
                    )
        return upcast_transfer_dtypes(batch)

    def attach_device_frame_cache(self, state):
        """build_state helper: upload the train split's per-frame arrays
        once as '_const_frame_cache' (carried through steps donation-aliased
        in place, excluded from checkpoints — same contract as the device
        dict bank)."""
        if not self.cfg.get("use_device_frame_cache"):
            return state
        ds = getattr(getattr(self, "data", None), "ds", None)
        if ds is None or not hasattr(ds, "device_frame_cache"):
            # the train provider already emits item_idx-only batches when
            # the flag is set, so running without the cache would KeyError
            # inside jit — fail loudly at construction instead
            raise ValueError(
                "use_device_frame_cache=true but the data provider exposes "
                "no .ds.device_frame_cache (wrap providers like run.py's "
                "_Splits with a .ds alias, or unset the flag)"
            )
        state["_const_frame_cache"] = {
            k: jnp.asarray(v)
            for k, v in ds.device_frame_cache(
                max_frames=self.cfg.get("max_frames")
            ).items()
        }
        return state

    def _train_step_inner(self, state, batch, rng):
        batch = self.prepare_batch(state, batch)
        rng_g, rng_d = jax.random.split(rng)
        step = state["step"]
        adv_on = jnp.logical_and(step >= self.disc_start_steps, self.lambda_adv > 0)
        (loss_g, (g_losses, out)), grads_g = jax.value_and_grad(
            self._gen_losses, has_aux=True
        )(state["params_g"], state["params_d"], batch, rng_g, True, adv_on.astype(jnp.float32))
        # NaN guard: skip the update on a non-finite loss (reference
        # print_nan_grads / NaN-skip, utils/trainer.py:320-327); the optimizer
        # state is left untouched so adam moments/schedule don't tick on a
        # skipped batch.
        finite = jnp.isfinite(loss_g)
        grads_g = jax.tree.map(lambda g: g * finite.astype(g.dtype), grads_g)
        updates, opt_g = self.tx_g.update(grads_g, state["opt_g"], state["params_g"])
        updates = jax.tree.map(lambda u: u * finite.astype(u.dtype), updates)
        params_g = optax.apply_updates(state["params_g"], updates)
        opt_g = _select_tree(finite, opt_g, state["opt_g"])

        mel_fake = jax.lax.stop_gradient(out["mel_out"])
        (loss_d, d_losses), grads_d = jax.value_and_grad(self._disc_losses, has_aux=True)(
            state["params_d"], mel_fake, batch["mels"], batch["mel_lengths"], rng_d
        )
        disc_on = jnp.logical_and(adv_on, (step % self.disc_interval) == 0)
        grads_d = jax.tree.map(lambda g: g * disc_on.astype(g.dtype), grads_d)
        updates_d, opt_d = self.tx_d.update(grads_d, state["opt_d"], state["params_d"])
        updates_d = jax.tree.map(lambda u: u * disc_on.astype(u.dtype), updates_d)
        params_d = optax.apply_updates(state["params_d"], updates_d)
        # while the disc is gated off the reference returns loss=None for
        # opt_idx 1, so optimizer.step/scheduler never run
        # (utils/trainer.py:281-286, tasks/tts/ps_adv.py:61-66): keep the
        # whole disc optimizer state (adam moments + schedule count) frozen.
        opt_d = _select_tree(disc_on, opt_d, state["opt_d"])
        new_state = {
            "params_g": params_g, "params_d": params_d,
            "opt_g": opt_g, "opt_d": opt_d, "step": step + 1,
            # state-resident constants (device dict bank, ...) pass through
            # untouched: with donate_argnums=(0,) XLA aliases them in place
            **{k: v for k, v in state.items() if k.startswith("_const_")},
        }
        metrics = {**g_losses, **d_losses, "total_loss": loss_g, "disc_loss": loss_d}
        return new_state, metrics

    def val_step(self, state, batch, rng):
        with self._amp_scope():
            batch = self.prepare_batch(state, batch)
            _, (losses, _) = self._gen_losses(
                state["params_g"], state["params_d"], batch, rng, train=False
            )
        losses = dict(losses)
        losses["total_loss"] = sum(losses.values())
        return losses

    # -- data --------------------------------------------------------------
    def train_batches(self) -> Iterable[dict]:
        return self.data.train_batches()

    def val_batches(self) -> Iterable[dict]:
        return self.data.val_batches()

    def test_batches(self) -> Iterable[dict]:
        return self.data.test_batches()
