"""Finer on-device attribution inside the production GAN step.

ablate_step.py split the 34 ms pure-device step into gen_grad ~24 ms /
disc_grad ~11 ms (ideal-compute bound ~6 ms total). This script answers the
next two questions:

1. WHICH generator submodule eats the forward (dict encoder vs FVAE vs the
   f32 prior flow vs the mel/SSIM losses)?
2. Is each piece THROUGHPUT-bound (time ~ batch) or LATENCY-bound (time flat
   in batch — many tiny sequential XLA ops, fixed per-op cost)? Pieces are
   timed at B=60 and B=120: ratio ~2 = throughput, ~1 = latency.

Method: every piece is an N-chained lax.scan inside one jit, one host sync,
RTT subtracted (CLAUDE.md timing rules). Usage:

    python scripts/ablate_fine.py [--n_chain 32] [pieces ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

B, TW, TM, LK, LP, E, H = 60, 64, 512, 96, 8, 768, 192


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pieces", nargs="*", default=[
        "enc_fwd", "fvae_fwd", "fvae_noflow_fwd", "losses", "disc_fwd",
        "enc_fwd_x2", "fvae_fwd_x2", "disc_fwd_x2",
    ])
    ap.add_argument("--n_chain", type=int, default=32)
    ap.add_argument("--floors", action="store_true",
                    help="also print per-piece roofline floors from "
                         "cost_analysis: flops/peak and bytes/HBM-BW — the "
                         "piece is near speed-of-light when measured ~ "
                         "max(flop_floor, byte_floor)")
    args = ap.parse_args()

    import jax

    # match the production entry points (run.py/bench.py): hardware PRNG
    jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp
    import numpy as np

    from dicttts_tpu.models.dict_encoder import DictEncoder, DictMsg
    from dicttts_tpu.models.discriminator import MultiWindowDiscriminator
    from dicttts_tpu.models.fvae import FVAE
    from dicttts_tpu.ops.amp import amp_scope
    from dicttts_tpu.train import losses as L

    N = args.n_chain
    rng0 = np.random.RandomState(0)

    def inputs(b):
        words = jnp.asarray(rng0.randint(3, 8000, (b, TW)).astype(np.int32))
        dm = DictMsg(
            keys=jnp.asarray(rng0.randn(b, TW, LK, E).astype(np.float32)).astype(jnp.bfloat16),
            values=None,  # keys reused (device-bank convention)
            key_map=jnp.asarray((rng0.randint(0, 3, (b, TW, LK)) + (np.arange(LK) == 0)).astype(np.int32)),
            pinyin=jnp.asarray(rng0.randint(1, 185, (b, TW, LP)).astype(np.int32)),
            pinyin_map=jnp.asarray(np.tile([1, 1, 2, 2, 0, 0, 0, 0], (b, TW, 1)).astype(np.int32)),
        )
        dm = dm._replace(values=dm.keys)
        mel2word = jnp.asarray(
            np.repeat(np.arange(1, TW + 1), TM // TW)[None].repeat(b, 0).astype(np.int32))
        mels = jnp.asarray(rng0.randn(b, TM, 80).astype(np.float32))
        g = jnp.asarray(rng0.randn(b, TM, H).astype(np.float32))
        mask = jnp.ones((b, TM, 1), jnp.float32)
        return words, dm, mel2word, mels, g, mask

    def piece_fn(name):
        """Returns (body(env, c, r) -> (c, c), env) — env holds all device
        inputs and is passed as a JIT ARGUMENT, never closure-captured:
        closured arrays bake into the HLO as constants and the 566 MB dict
        bank blows the relay's remote_compile request limit (HTTP 413)."""
        scale = 2 if name.endswith("_x2") else 1
        base = name[:-3] if name.endswith("_x2") else name
        b = B * scale
        words, dm, mel2word, mels, g, mask = inputs(b)

        if base == "enc_fwd":
            mod = DictEncoder(8000, H, 2, 5, 0.1, 185)
            params = mod.init(
                {"params": jax.random.PRNGKey(0)}, words, dm, None, True)["params"]
            env = {"params": params, "words": words, "dm": dm}

            def body(env, c, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    x, _, _, _ = mod.apply(
                        {"params": env["params"]}, env["words"], env["dm"],
                        None, False, rngs={"dropout": r})
                return c + jnp.sum(x.astype(jnp.float32)) * 0, c

        elif base in ("fvae_fwd", "fvae_noflow_fwd"):
            mod = FVAE(
                in_out_channels=80, hidden_channels=192, latent_size=16,
                kernel_size=5, enc_n_layers=8, dec_n_layers=4,
                gin_channels=H, strides=(4,),
                use_prior_flow=(base == "fvae_fwd"),
                flow_hidden=64, flow_kernel_size=3, flow_n_steps=4,
            )
            params = mod.init(
                {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                x=mels, x_mask=mask, g=g, infer=False)["params"]
            env = {"params": params, "mels": mels, "mask": mask, "g": g}

            def body(env, c, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    out, kl, *_ = mod.apply(
                        {"params": env["params"]}, x=env["mels"],
                        x_mask=env["mask"], g=env["g"],
                        infer=False, deterministic=False,
                        rngs={"sample": r, "dropout": r})
                return c + (jnp.sum(out.astype(jnp.float32)) + kl) * 0, c

        elif base == "enc_grad":
            mod = DictEncoder(8000, H, 2, 5, 0.1, 185)
            params = mod.init(
                {"params": jax.random.PRNGKey(0)}, words, dm, None, True)["params"]
            env = {"params": params, "words": words, "dm": dm}

            def loss_fn(p, env, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    x, _, _, _ = mod.apply(
                        {"params": p}, env["words"], env["dm"], None, False,
                        rngs={"dropout": r})
                return jnp.sum(x.astype(jnp.float32) ** 2)

            def body(env, c, r):
                loss, grads = jax.value_and_grad(loss_fn)(env["params"], env, r)
                gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                           for g in jax.tree.leaves(grads))
                return c + (loss + gsum) * 0, c

        elif base in ("fvae_grad_remat", "enc_grad_remat"):
            # jax.checkpoint around the module apply: bwd recomputes the
            # forward instead of saving activations — trades (cheap) flops
            # for HBM traffic on the bandwidth-bound pieces
            if base == "enc_grad_remat":
                mod = DictEncoder(8000, H, 2, 5, 0.1, 185)
                params = mod.init(
                    {"params": jax.random.PRNGKey(0)}, words, dm, None, True)["params"]
                env = {"params": params, "words": words, "dm": dm}

                @jax.checkpoint
                def fwd(p, words, dm, r):
                    with amp_scope("bfloat16", jnp.bfloat16):
                        x, _, _, _ = mod.apply(
                            {"params": p}, words, dm, None, False,
                            rngs={"dropout": r})
                    return jnp.sum(x.astype(jnp.float32) ** 2)

                def loss_fn(p, env, r):
                    return fwd(p, env["words"], env["dm"], r)
            else:
                mod = FVAE(
                    in_out_channels=80, hidden_channels=192, latent_size=16,
                    kernel_size=5, enc_n_layers=8, dec_n_layers=4,
                    gin_channels=H, strides=(4,), use_prior_flow=True,
                    flow_hidden=64, flow_kernel_size=3, flow_n_steps=4,
                )
                params = mod.init(
                    {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                    x=mels, x_mask=mask, g=g, infer=False)["params"]
                env = {"params": params, "mels": mels, "mask": mask, "g": g}

                @jax.checkpoint
                def fwd(p, mels, mask, g, r):
                    with amp_scope("bfloat16", jnp.bfloat16):
                        out, kl, *_ = mod.apply(
                            {"params": p}, x=mels, x_mask=mask, g=g,
                            infer=False, deterministic=False,
                            rngs={"sample": r, "dropout": r})
                    return jnp.sum(out.astype(jnp.float32) ** 2) + kl

                def loss_fn(p, env, r):
                    return fwd(p, env["mels"], env["mask"], env["g"], r)

            def body(env, c, r):
                loss, grads = jax.value_and_grad(loss_fn)(env["params"], env, r)
                gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                           for g in jax.tree.leaves(grads))
                return c + (loss + gsum) * 0, c

        elif base in ("fvae_grad", "fvae_noflow_grad"):
            mod = FVAE(
                in_out_channels=80, hidden_channels=192, latent_size=16,
                kernel_size=5, enc_n_layers=8, dec_n_layers=4,
                gin_channels=H, strides=(4,), use_prior_flow=base == "fvae_grad",
                flow_hidden=64, flow_kernel_size=3, flow_n_steps=4,
            )
            params = mod.init(
                {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                x=mels, x_mask=mask, g=g, infer=False)["params"]
            env = {"params": params, "mels": mels, "mask": mask, "g": g}

            def loss_fn(p, env, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    out, kl, *_ = mod.apply(
                        {"params": p}, x=env["mels"], x_mask=env["mask"],
                        g=env["g"], infer=False, deterministic=False,
                        rngs={"sample": r, "dropout": r})
                return jnp.sum(out.astype(jnp.float32) ** 2) + kl

            def body(env, c, r):
                loss, grads = jax.value_and_grad(loss_fn)(env["params"], env, r)
                gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                           for g in jax.tree.leaves(grads))
                return c + (loss + gsum) * 0, c

        elif base == "glue_grad":
            # gather_expand (word->frame) fwd+bwd: the bwd is a scatter-add
            # over 512 frames into 64 word slots — TPU scatters are the
            # classic hidden cost in gather-heavy models
            from dicttts_tpu.ops.seq import gather_expand
            x_words = jnp.asarray(rng0.randn(b, TW, H).astype(np.float32))
            env = {"x": x_words, "mel2word": mel2word}

            def loss_fn(x, env):
                out = gather_expand(x, env["mel2word"])
                return jnp.sum(out.astype(jnp.float32) ** 2)

            def body(env, c, r):
                loss, gx = jax.value_and_grad(loss_fn)(env["x"] + c * 0, env)
                return c + (loss + jnp.sum(jnp.abs(gx))) * 0, c

        elif base == "disc_grad1":
            # one batched (real+fake stacked) disc apply + grad wrt params —
            # the post-batching _disc_losses shape
            mod = MultiWindowDiscriminator(
                time_lengths=(32, 64, 128), freq_length=80, hidden_size=128)
            lengths = jnp.full((2 * b,), TM, jnp.int32)
            mels2 = jnp.concatenate([mels, mels + 0.1], axis=0)
            params = mod.init(
                {"params": jax.random.PRNGKey(0)}, mels2, lengths,
                rng=jax.random.PRNGKey(1))["params"]
            env = {"params": params, "mels2": mels2, "lengths": lengths}

            def loss_fn(p, env, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    out = mod.apply(
                        {"params": p}, env["mels2"], env["lengths"], rng=r,
                        deterministic=False, rngs={"dropout": r})
                return jnp.sum(out["y"].astype(jnp.float32) ** 2)

            def body(env, c, r):
                loss, grads = jax.value_and_grad(loss_fn)(env["params"], env, r)
                gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                           for g in jax.tree.leaves(grads))
                return c + (loss + gsum) * 0, c

        elif base == "losses":
            spec = L.parse_mel_loss_spec("ssim:0.5|l1:0.5")
            env = {"mels": mels, "fake": mels + 0.1}

            def body(env, c, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    d: dict = {}
                    L.add_mel_losses(spec, env["fake"] + c * 0, env["mels"], d)
                return c + sum(d.values()) * 0, c

        elif base in ("disc_fwd", "disc_fwd_nodrop", "disc_fwd_noin"):
            mod = MultiWindowDiscriminator(
                time_lengths=(32, 64, 128), freq_length=80, hidden_size=128,
                norm_type="none" if base == "disc_fwd_noin" else "in")
            det = base == "disc_fwd_nodrop"
            lengths = jnp.full((b,), TM, jnp.int32)
            params = mod.init(
                {"params": jax.random.PRNGKey(0)}, mels, lengths,
                rng=jax.random.PRNGKey(1))["params"]
            env = {"params": params, "mels": mels, "lengths": lengths}

            def body(env, c, r, det=det):
                with amp_scope("bfloat16", jnp.bfloat16):
                    out = mod.apply(
                        {"params": env["params"]}, env["mels"] + c * 0,
                        env["lengths"], rng=r,
                        deterministic=det, rngs={"dropout": r})
                return c + jnp.sum(out["y"].astype(jnp.float32)) * 0, c

        elif base in ("conv_stack", "dot_stack"):
            # 8 sequential k=5 convs H->2H->H at [B,128,192]: nn.Conv
            # (lax.conv_general_dilated) vs explicit unfold+dot — same math,
            # different lowering. If dot wins, the repo's hot conv stacks
            # (WN/FVAE/dur/disc) should lower to dots.
            Tq = 128
            x0 = jnp.asarray(rng0.randn(b, Tq, H).astype(np.float32)).astype(jnp.bfloat16)
            ws = [jnp.asarray(rng0.randn(5, H, 2 * H).astype(np.float32) * 0.05).astype(jnp.bfloat16)
                  for _ in range(8)]
            wo = [jnp.asarray(rng0.randn(1, 2 * H, H).astype(np.float32) * 0.05).astype(jnp.bfloat16)
                  for _ in range(8)]
            env = {"x": x0, "ws": ws, "wo": wo}

            if base == "conv_stack":
                def body(env, c, r):
                    x = env["x"] + c.astype(jnp.bfloat16) * 0
                    for w, o in zip(env["ws"], env["wo"]):
                        h2 = jax.lax.conv_general_dilated(
                            x, w, (1,), "SAME",
                            dimension_numbers=("NHC", "HIO", "NHC"))
                        h2 = jnp.tanh(h2[..., :H]) * jax.nn.sigmoid(h2[..., H:])
                        x = x + jax.lax.conv_general_dilated(
                            h2, o, (1,), "SAME",
                            dimension_numbers=("NHC", "HIO", "NHC"))
                    return c + jnp.sum(x.astype(jnp.float32)) * 0, c
            else:
                def body(env, c, r):
                    x = env["x"] + c.astype(jnp.bfloat16) * 0
                    for w, o in zip(env["ws"], env["wo"]):
                        xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
                        # unfold: [B, T, 5*H] as 5 shifted views
                        u = jnp.concatenate(
                            [xp[:, i:i + Tq] for i in range(5)], axis=-1)
                        h2 = jnp.einsum(
                            "btk,kf->btf", u,
                            jnp.transpose(w, (0, 1, 2)).reshape(5 * H, 2 * H))
                        h2 = jnp.tanh(h2[..., :H]) * jax.nn.sigmoid(h2[..., H:])
                        x = x + jnp.einsum("bth,hf->btf", h2, o[0])
                    return c + jnp.sum(x.astype(jnp.float32)) * 0, c

        elif base in ("s2pa_gather_grad", "s2pa_nogather_grad", "s2pa_gather_fwd"):
            # The S2PA core at REAL production data flow: an [8001, L, E]
            # bf16 device bank (1.18 GB in HBM), word ids [B, TW], and the
            # reassociated projections (models/dict_encoder.py:172-206).
            # 'gather' variants index the bank inside the step (the
            # train-time path, tasks/dict_tts.py _dict_msg); 'nogather'
            # takes the [B,TW,L,E] slice as an input — the difference is
            # the per-step HBM cost of materializing + re-reading the
            # gathered copy, which is the candidate for a fused kernel.
            NW = 8001
            bank = jnp.asarray(
                rng0.randn(NW, LK, E).astype(np.float32) * 0.05).astype(jnp.bfloat16)
            km_bank = jnp.asarray(
                (rng0.randint(0, 3, (NW, LK)) + (np.arange(LK) == 0)).astype(np.int32))
            pm_bank = jnp.asarray(np.tile([1, 1, 2, 2, 0, 0, 0, 0], (NW, 1)).astype(np.int32))
            wt = jnp.asarray(rng0.randint(3, NW, (b, TW)).astype(np.int32))
            x_in = jnp.asarray(rng0.randn(b, TW, H).astype(np.float32) * 0.1).astype(jnp.bfloat16)
            p0 = {
                "wq": jnp.asarray(rng0.randn(H, H).astype(np.float32) * H**-0.5).astype(jnp.bfloat16),
                "wk": jnp.asarray(rng0.randn(E, H).astype(np.float32) * E**-0.5).astype(jnp.bfloat16),
                "wv": jnp.asarray(rng0.randn(E, H).astype(np.float32) * E**-0.5).astype(jnp.bfloat16),
            }
            if base == "s2pa_nogather_grad":
                env = {"p": p0, "x": x_in, "keys": bank[wt], "km": km_bank[wt],
                       "pm": pm_bank[wt]}
            else:
                env = {"p": p0, "x": x_in, "bank": bank, "km_bank": km_bank,
                       "pm_bank": pm_bank, "wt": wt}

            from dicttts_tpu.models.dict_encoder import S2PA_MASK_VALUE, sense_remap

            def s2pa_fwd(p, keys, km, pm, x, r):
                q = jnp.einsum("bth,hj->btj", x, p["wq"]) * (E**-0.5)
                q_e = jnp.einsum("bth,eh->bte", q, p["wk"])
                logits = jnp.einsum("btle,bte->btl", keys, q_e).astype(jnp.float32)
                logits = jnp.where(km != 0, logits, S2PA_MASK_VALUE)
                w = jax.nn.softmax(logits, axis=-1)
                keep = jax.random.bernoulli(r, 0.9, w.shape)
                w_d = jnp.where(keep, w / 0.9, 0.0)
                ctx_e = jnp.einsum("btl,btle->bte", w_d.astype(keys.dtype), keys)
                ctx = jnp.einsum("bte,eh->bth", ctx_e, p["wv"])
                pron = sense_remap(w_d, km, pm)
                return jnp.sum(ctx.astype(jnp.float32) ** 2) + jnp.sum(pron ** 2)

            if base == "s2pa_gather_fwd":
                def body(env, c, r):
                    keys = env["bank"][env["wt"]]
                    loss = s2pa_fwd(env["p"], keys, env["km_bank"][env["wt"]],
                                    env["pm_bank"][env["wt"]], env["x"], r)
                    return c + loss * 0, c
            elif base == "s2pa_gather_grad":
                def loss_fn(p, env, r):
                    keys = env["bank"][env["wt"]]
                    return s2pa_fwd(p, keys, env["km_bank"][env["wt"]],
                                    env["pm_bank"][env["wt"]], env["x"], r)

                def body(env, c, r):
                    loss, grads = jax.value_and_grad(loss_fn)(env["p"], env, r)
                    gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                               for g in jax.tree.leaves(grads))
                    return c + (loss + gsum) * 0, c
            else:
                def loss_fn(p, env, r):
                    return s2pa_fwd(p, env["keys"], env["km"], env["pm"], env["x"], r)

                def body(env, c, r):
                    loss, grads = jax.value_and_grad(loss_fn)(env["p"], env, r)
                    gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                               for g in jax.tree.leaves(grads))
                    return c + (loss + gsum) * 0, c

        elif base in ("s2pa_bank_grad", "s2pa_bank_fwd"):
            # the gather-FUSED Pallas kernel (ops/s2pa_bank_pallas.py) at the
            # same production data flow as s2pa_gather_grad: the [8001,L,E]
            # bank stays in HBM and the kernel's BlockSpec index_map gathers
            # rows; compare directly against s2pa_gather_grad / _fwd.
            from dicttts_tpu.models.dict_encoder import sense_remap
            from dicttts_tpu.ops.s2pa_bank_pallas import s2pa_bank_attend

            NW = 8001
            bank = jnp.asarray(
                rng0.randn(NW, LK, E).astype(np.float32) * 0.05).astype(jnp.bfloat16)
            km_bank = jnp.asarray(
                (rng0.randint(0, 3, (NW, LK)) + (np.arange(LK) == 0)).astype(np.int32))
            pm_bank = jnp.asarray(np.tile([1, 1, 2, 2, 0, 0, 0, 0], (NW, 1)).astype(np.int32))
            wt = jnp.asarray(rng0.randint(3, NW, (b, TW)).astype(np.int32))
            x_in = jnp.asarray(rng0.randn(b, TW, H).astype(np.float32) * 0.1).astype(jnp.bfloat16)
            p0 = {
                "wq": jnp.asarray(rng0.randn(H, H).astype(np.float32) * H**-0.5).astype(jnp.bfloat16),
                "wk": jnp.asarray(rng0.randn(E, H).astype(np.float32) * E**-0.5).astype(jnp.bfloat16),
                "wv": jnp.asarray(rng0.randn(E, H).astype(np.float32) * E**-0.5).astype(jnp.bfloat16),
            }
            env = {"p": p0, "x": x_in, "bank": bank, "km_bank": km_bank,
                   "pm_bank": pm_bank, "wt": wt}

            def fused_fwd(p, env, r):
                wt, km = env["wt"], env["km_bank"][env["wt"]]
                pm = env["pm_bank"][env["wt"]]
                q = jnp.einsum("bth,hj->btj", env["x"], p["wq"]) * (E**-0.5)
                q_e = jnp.einsum("bth,eh->bte", q, p["wk"])
                keep = jax.random.bernoulli(r, 0.9, (b, TW, LK))
                mask = keep.astype(jnp.float32) / 0.9
                ctx_e, w = s2pa_bank_attend(
                    env["bank"], wt.reshape(-1),
                    q_e.reshape(-1, E).astype(env["bank"].dtype),
                    km.reshape(-1, LK), mask.reshape(-1, LK))
                w_d = w.reshape(b, TW, LK) * mask
                ctx = jnp.einsum("bte,eh->bth", ctx_e.reshape(b, TW, E), p["wv"])
                pron = sense_remap(w_d, km, pm)
                return jnp.sum(ctx.astype(jnp.float32) ** 2) + jnp.sum(pron ** 2)

            if base == "s2pa_bank_fwd":
                def body(env, c, r):
                    return c + fused_fwd(env["p"], env, r) * 0, c
            else:
                def body(env, c, r):
                    loss, grads = jax.value_and_grad(fused_fwd)(env["p"], env, r)
                    gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                               for g in jax.tree.leaves(grads))
                    return c + (loss + gsum) * 0, c

        else:
            raise SystemExit(f"unknown piece {name}")

        return body, env

    @jax.jit
    def trivial(x):
        return x + 1.0

    float(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.float32(1)))
    rtt = (time.perf_counter() - t0) / 5
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 1)}), flush=True)

    for name in args.pieces:
        try:
            body, env = piece_fn(name)

            @jax.jit
            def chain(env, c0, rng, body=body):
                rngs = jax.random.split(rng, N)
                c, _ = jax.lax.scan(lambda c, r: body(env, c, r), c0, rngs)
                return c

            float(chain(env, jnp.float32(0), jax.random.PRNGKey(1)))  # compile
            reps = []
            for i in range(3):
                t0 = time.perf_counter()
                float(chain(env, jnp.float32(i), jax.random.PRNGKey(2 + i)))
                reps.append(time.perf_counter() - t0)
            best = min(reps)
            rec = {
                "piece": name, "n_chain": N,
                "ms_per_step": round(1e3 * max(best - rtt, 0) / N, 2),
            }
            if args.floors:
                # floors from ONE body compiled standalone (fusion context
                # differs slightly from the scan, but flop/byte totals are
                # the same math). v5e peaks: 197 TFLOP/s bf16, ~819 GB/s HBM.
                one = jax.jit(lambda env, c, r, body=body: body(env, c, r))
                ca = one.lower(
                    env, jnp.float32(0), jax.random.PRNGKey(0)).compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                flops = float(ca.get("flops", 0.0))
                byts = float(ca.get("bytes accessed", 0.0))
                rec["flop_floor_ms"] = round(1e3 * flops / 197e12, 3)
                rec["byte_floor_ms"] = round(1e3 * byts / 819e9, 3)
                rec["gap_x"] = round(
                    rec["ms_per_step"]
                    / max(rec["flop_floor_ms"], rec["byte_floor_ms"], 1e-6), 2)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"piece": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
