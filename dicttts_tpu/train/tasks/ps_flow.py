"""PortaSpeech flow task (reference tasks/tts/ps_flow.py): the non-
adversarial variant — KL + mel + word-duration losses — plus the TWO-STAGE
post-glow training the reference describes but cannot run (its Glow import
is broken upstream, model.py:188; see models/post_glow.py).

Two-stage semantics (ps_flow.py:58-66 + egs ps_flow.yaml:63 two_stage):
  step <  post_glow_training_start : main VAE losses train, postflow frozen
  step >= post_glow_training_start : ONLY the postflow NLL trains; the main
                                     net is frozen (its optimizer state —
                                     adam moments, schedule count — stops
                                     ticking, same freeze discipline as the
                                     disc gating in adv_base).
Implemented as one jitted step: both losses are computed, stage weights
gate the gradients, and optax.masked partitions the parameter tree by the
`post_flow` subtree so each stage's optimizer only touches its own params.

two_stage=false (the reference's joint mode) trains main + postflow
together under the single generator optimizer — that is exactly the parent
class's step with `_gen_losses` adding the postflow NLL to the total.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from dicttts_tpu.train.tasks.adv_base import _select_tree
from dicttts_tpu.train.tasks.ps_adv import PortaSpeechAdvTask
from dicttts_tpu.utils.schedulers import rsqrt_schedule


def _postflow_labels(params):
    """Label every leaf 'pf' (under the post_flow subtree) or 'main'."""

    def walk(tree, under_pf):
        if isinstance(tree, dict):
            return {k: walk(v, under_pf or k == "post_flow") for k, v in tree.items()}
        return "pf" if under_pf else "main"

    return walk(params, False)


class PortaSpeechFlowTask(PortaSpeechAdvTask):
    def __init__(self, cfg, data=None):
        cfg = dict(cfg)
        cfg["lambda_mel_adv"] = 0.0  # disable the adversarial term & disc updates
        self.use_post_glow = bool(cfg.get("use_post_glow", False))
        # two_stage=true (reference default): freeze-swap at
        # post_glow_training_start; false: joint main+postflow training
        self.two_stage = bool(cfg.get("two_stage", True))
        self.post_glow_training_start = cfg.get("post_glow_training_start", 160000)
        super().__init__(cfg, data)
        if self.use_post_glow:
            self.model = self.model.clone(
                use_post_glow=True,
                post_glow_hidden=cfg.get("post_glow_hidden", 192),
                post_glow_kernel_size=cfg.get("post_glow_kernel_size", 3),
                post_glow_n_blocks=cfg.get("post_glow_n_blocks", 12),
                post_glow_n_block_layers=cfg.get("post_glow_n_block_layers", 3),
                share_wn_layers=cfg.get("share_wn_layers", 4),
                sigmoid_scale=cfg.get("sigmoid_scale", False),
                use_txt_cond=cfg.get("use_txt_cond", True),
                detach_postflow_input=cfg.get("detach_postflow_input", True),
                infer_post_glow=cfg.get("infer_post_glow", True),
                post_noise_scale=cfg.get("noise_scale", 0.8),
            )
            # postflow optimizer: same family as the main one, lr from
            # post_glow_lr if set (reference reuses build_optimizer over the
            # second param group)
            self.tx_post = optax.chain(
                optax.clip_by_global_norm(self.cfg.get("generator_grad_norm", 1.0)),
                optax.adamw(
                    rsqrt_schedule(
                        self.cfg.get("post_glow_lr", self.cfg.get("lr", 1.0)),
                        self.cfg.get("warmup_updates", 8000),
                        self.cfg.get("hidden_size", 192),
                    ),
                    b1=self.cfg.get("optimizer_adam_beta1", 0.9),
                    b2=self.cfg.get("optimizer_adam_beta2", 0.98),
                ),
            )

    def build_state(self, rng) -> dict:
        state = super().build_state(rng)
        if self.use_post_glow and self.two_stage:
            pg = state["params_g"]
            labels = _postflow_labels(pg)
            # each stage optimizer updates ONLY its partition; the other
            # partition's updates are hard zeros (not passed-through grads)
            self.tx_main = optax.multi_transform(
                {"main": self.tx_g, "pf": optax.set_to_zero()}, labels
            )
            self.tx_pf = optax.multi_transform(
                {"main": optax.set_to_zero(), "pf": self.tx_post}, labels
            )
            state["opt_g"] = self.tx_main.init(pg)
            state["opt_pf"] = self.tx_pf.init(pg)
        return state

    def _gen_losses(self, params_g, params_d, batch, rng, train: bool, adv_w=1.0):
        total, (losses, out) = super()._gen_losses(params_g, params_d, batch, rng, train, adv_w)
        if self.use_post_glow and "postflow" in out:
            losses = dict(losses)
            losses["postflow"] = out["postflow"]
            total = total + out["postflow"]
        return total, (losses, out)

    def _train_step_inner(self, state, batch, rng):
        # joint mode (two_stage=false): the parent step already trains
        # main + postflow together (postflow added to total in _gen_losses)
        if not self.use_post_glow or not self.two_stage:
            return super()._train_step_inner(state, batch, rng)
        batch = self.prepare_batch(state, batch)
        step = state["step"]
        post_on = (step >= self.post_glow_training_start).astype(jnp.float32)

        def staged_loss(params_g):
            out = self._run_model(params_g, batch, rng, train=True)
            from dicttts_tpu.train import losses as L

            main = {"kl": L.clamp_kl(out["kl"] * self.lambda_kl, self.kl_min)}
            L.add_mel_losses(self.mel_loss_spec, out["mel_out"], batch["mels"], main)
            main["wdur"] = L.word_dur_loss(
                out["dur"], batch["mel2word"], batch["word_lengths"],
                self.cfg.get("dur_scale", "log"),
            )
            # hard select (not a blend): a non-finite value in the INACTIVE
            # stage's term must not poison the active stage (NaN*0=NaN under
            # the old sum-of-weighted form) — ADVICE r2
            total = jnp.where(post_on > 0, out["postflow"], sum(main.values()))
            return total, {**main, "postflow": out["postflow"]}

        (loss, losses), grads = jax.value_and_grad(staged_loss, has_aux=True)(
            state["params_g"]
        )
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: g * finite.astype(g.dtype), grads)

        main_on = jnp.logical_and(finite, post_on == 0.0)
        pf_on = jnp.logical_and(finite, post_on == 1.0)
        upd_m, opt_m = self.tx_main.update(grads, state["opt_g"], state["params_g"])
        upd_m = jax.tree.map(lambda u: u * main_on.astype(u.dtype), upd_m)
        params_g = optax.apply_updates(state["params_g"], upd_m)
        opt_m = _select_tree(main_on, opt_m, state["opt_g"])
        upd_p, opt_p = self.tx_pf.update(grads, state["opt_pf"], params_g)
        upd_p = jax.tree.map(lambda u: u * pf_on.astype(u.dtype), upd_p)
        params_g = optax.apply_updates(params_g, upd_p)
        opt_p = _select_tree(pf_on, opt_p, state["opt_pf"])

        new_state = {
            **{k: v for k, v in state.items()},
            "params_g": params_g, "opt_g": opt_m, "opt_pf": opt_p, "step": step + 1,
        }
        metrics = {**losses, "total_loss": loss, "post_stage": post_on}
        return new_state, metrics
