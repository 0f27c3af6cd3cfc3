"""Attribute the production train step's ON-DEVICE time to its pieces.

The dispatch sweep showed step time is flat in steps_per_dispatch (37 ms at
k=8/16/32), so the residual over the ~6 ms ideal-compute bound is on-device,
not host/relay. This script times each piece of the fused GAN step
(adv_base.py::_train_step_inner) as its own N-chained jit (one host sync per
chain, RTT subtracted — the only sound timing method through the relay, see
CLAUDE.md):

    gen_fwd        generator forward only (loss value, no grad)
    gen_grad       generator value_and_grad + adamw update
    disc_grad      discriminator value_and_grad (2 fwd) + adamw update
    full           the real train_step (reference point)

Pieces don't sum exactly to `full` (XLA fuses differently per graph), but
the ranking tells where to optimize. Usage:

    python scripts/ablate_step.py [--n_chain 32] [pieces ...]
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pieces", nargs="*",
                    default=["gen_fwd", "gen_grad", "disc_grad", "full"])
    ap.add_argument("--n_chain", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    # match the production entry points (run.py/bench.py): hardware PRNG
    jax.config.update("jax_default_prng_impl", "rbg")

    import bench
    from dicttts_tpu.data.datasets import TTSBatchProvider, TTSBinaryDataset
    from dicttts_tpu.run import autoconfigure_vocabs
    from dicttts_tpu.train.tasks.dict_tts import DictTTSTask
    from scripts.trace_trainer import pure_compute_probe  # cfg template lives there

    bdir = bench._ensure_prod_corpus()
    cfg = autoconfigure_vocabs({
        "binary_data_dir": bdir, "use_dict": True, "use_pitch_embed": False,
        "hidden_size": 192, "num_heads": 2,
        "enc_ffn_kernel_size": 5, "dropout": 0.1,
        "dict_embed_dim": 768, "latent_size": 16, "fvae_enc_dec_hidden": 192,
        "fvae_enc_n_layers": 8, "fvae_dec_n_layers": 4,
        "prior_glow_hidden": 64, "prior_glow_n_blocks": 4,
        "mel_disc_hidden_size": 128, "disc_win_num": 3, "warmup_updates": 8000,
        "mel_loss": "ssim:0.5|l1:0.5", "dur_predictor_layers": 3, "amp": True,
        "max_frames": 512, "max_tokens": 31000, "max_sentences": 60,
        "mel_buckets": [512], "txt_buckets": [64],
        "gloss_buckets": [96], "pinyin_buckets": [8], "frames_multiple": 4,
        "sentence_buckets": [60],
        "use_device_dict_bank": True, "use_device_frame_cache": True,
        "disc_start_steps": 0,
    })
    ds = TTSBinaryDataset(bdir, "train", cfg, kind="dict")
    provider = TTSBatchProvider(ds, cfg, shuffle=True, emit_frame_refs=True)
    task = DictTTSTask(cfg, provider)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = next(iter(provider.train_batches()))
    batch.pop("_meta", None)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    N = args.n_chain

    def piece_fn(name):
        if name == "full":
            def body(st, r):
                st, m = task.train_step(st, batch, r)
                return st, m["total_loss"]
            return body, state

        if name == "gen_fwd":
            def body(st, r):
                with task._amp_scope():
                    b = task.prepare_batch(st, batch)
                    loss, _ = task._gen_losses(
                        st["params_g"], st["params_d"], b, r, True,
                        jnp.float32(1.0))
                # fold the loss back so the scan carry is data-dependent
                st = dict(st)
                st["step"] = st["step"] + (loss > -1e30).astype(st["step"].dtype)
                return st, loss
            return body, state

        if name == "gen_grad":
            def body(st, r):
                with task._amp_scope():
                    b = task.prepare_batch(st, batch)
                    (loss, _), grads = jax.value_and_grad(
                        task._gen_losses, has_aux=True
                    )(st["params_g"], st["params_d"], b, r, True, jnp.float32(1.0))
                updates, opt_g = task.tx_g.update(grads, st["opt_g"], st["params_g"])
                st = dict(st)
                st["params_g"] = optax.apply_updates(st["params_g"], updates)
                st["opt_g"] = opt_g
                st["step"] = st["step"] + 1
                return st, loss
            return body, state

        if name == "disc_grad":
            # the disc sees a fixed fake mel (real mels shifted) — same
            # shapes/flops as training, no generator in the graph
            def body(st, r):
                with task._amp_scope():
                    b = task.prepare_batch(st, batch)
                    fake = jnp.roll(b["mels"], 1, axis=0)
                    (loss, _), grads = jax.value_and_grad(
                        task._disc_losses, has_aux=True
                    )(st["params_d"], fake, b["mels"], b["mel_lengths"], r)
                updates, opt_d = task.tx_d.update(grads, st["opt_d"], st["params_d"])
                st = dict(st)
                st["params_d"] = optax.apply_updates(st["params_d"], updates)
                st["opt_d"] = opt_d
                st["step"] = st["step"] + 1
                return st, loss
            return body, state

        if name == "opt_only":
            # adamw update cost alone: fixed synthetic grads (params * eps),
            # both optimizers — isolates the per-param-tensor op overhead
            def body(st, r):
                grads_g = jax.tree.map(lambda p: p * 1e-9, st["params_g"])
                updates, opt_g = task.tx_g.update(grads_g, st["opt_g"], st["params_g"])
                grads_d = jax.tree.map(lambda p: p * 1e-9, st["params_d"])
                updates_d, opt_d = task.tx_d.update(grads_d, st["opt_d"], st["params_d"])
                st = dict(st)
                st["params_g"] = optax.apply_updates(st["params_g"], updates)
                st["params_d"] = optax.apply_updates(st["params_d"], updates_d)
                st["opt_g"], st["opt_d"] = opt_g, opt_d
                st["step"] = st["step"] + 1
                return st, st["step"].astype(jnp.float32)
            return body, state

        raise SystemExit(f"unknown piece {name}")

    import numpy as np  # noqa: F401

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
        body, st0 = piece_fn(name)

        @jax.jit
        def chain(st, rng, body=body):
            rngs = jax.random.split(rng, N)
            _, losses = jax.lax.scan(body, st, rngs)
            return losses[-1]

        try:
            float(chain(st0, jax.random.PRNGKey(1)))  # compile
            reps = []
            for i in range(3):
                t0 = time.perf_counter()
                float(chain(st0, jax.random.PRNGKey(2 + i)))
                reps.append(time.perf_counter() - t0)
            best = min(reps)
            print(json.dumps({
                "piece": name, "n_chain": N,
                "ms_per_step": round(1e3 * max(best - rtt, 0) / N, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(json.dumps({"piece": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
