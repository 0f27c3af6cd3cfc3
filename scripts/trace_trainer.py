"""One traced trainer run at the production geometry (perf diagnosis).

Runs bench._bench_trainer with GRAFT_TRACE_GROUPS=1 so the trainer prints
its per-group host-side cost breakdown (batch wait / pad+stack / device_put
/ dispatch issuance) alongside the steady-state ms/step. Usage:

    python scripts/trace_trainer.py [--k 8] [--updates 160] [--no_cache]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("GRAFT_TRACE_GROUPS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--updates", type=int, default=160)
    ap.add_argument("--no_cache", action="store_true")
    ap.add_argument("--pure", type=int, default=0,
                    help="also run the pure-compute probe with this chain depth")
    args = ap.parse_args()

    import jax

    # match the production entry points (run.py/bench.py): hardware PRNG
    jax.config.update("jax_default_prng_impl", "rbg")

    import bench

    bdir = bench._ensure_prod_corpus()
    out = bench._bench_trainer(
        bdir, frame_cache=not args.no_cache, k_dispatch=args.k,
        max_updates=args.updates,
    )
    print(json.dumps(out, indent=1))
    if args.pure:
        out2 = pure_compute_probe(bdir, n_chain=args.pure)
        print(json.dumps(out2, indent=1))


def pure_compute_probe(bdir: str, n_chain: int = 64) -> dict:
    """True on-device ms/step: chain n_chain train steps over ONE
    device-resident batch inside a single jit (lax.scan), sync once by
    pulling a scalar, subtract the RTT probe — no host collate, no
    transfer, no per-group dispatch issuance. The gap between this and the
    trainer's end-to-end steady ms/step is, by construction, host+relay."""
    import time

    import jax
    import jax.numpy as jnp

    from dicttts_tpu.data.datasets import TTSBatchProvider, TTSBinaryDataset
    from dicttts_tpu.run import autoconfigure_vocabs
    from dicttts_tpu.train.tasks.dict_tts import DictTTSTask

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

    @jax.jit
    def chain(state, batch, rng):
        rngs = jax.random.split(rng, n_chain)

        def body(st, r):
            st, m = task.train_step(st, batch, r)
            return st, m["total_loss"]

        _, losses = jax.lax.scan(body, state, rngs)
        return losses[-1]

    # RTT probe: trivial jit, host pull
    @jax.jit
    def trivial(x):
        return x + 1.0

    float(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.float32(1)))
    rtt = (time.perf_counter() - t0) / 5

    float(chain(state, batch, jax.random.PRNGKey(1)))  # compile
    reps = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chain(state, batch, jax.random.PRNGKey(2 + i)))
        reps.append(time.perf_counter() - t0)
    best = min(reps)
    return {
        "pure_device_ms_per_step": round(1e3 * max(best - rtt, 0) / n_chain, 2),
        "rtt_ms": round(1e3 * rtt, 1),
        "n_chain": n_chain,
    }


if __name__ == "__main__":
    main()
