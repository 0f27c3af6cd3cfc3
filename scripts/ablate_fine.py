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
    args = ap.parse_args()

    import jax
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
        scale = 2 if name.endswith("_x2") else 1
        base = name[:-3] if name.endswith("_x2") else name
        b = B * scale
        words, dm, mel2word, mels, g, mask = inputs(b)

        if base == "enc_fwd":
            mod = DictEncoder(8000, H, 2, 5, 0.1, 185)
            params = mod.init(
                {"params": jax.random.PRNGKey(0)}, words, dm, None, True)["params"]

            def body(c, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    x, _, _, _ = mod.apply(
                        {"params": params}, words, dm, None, False,
                        rngs={"dropout": r})
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

            def body(c, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    out, kl, *_ = mod.apply(
                        {"params": params}, x=mels, x_mask=mask, g=g,
                        infer=False, deterministic=False,
                        rngs={"sample": r, "dropout": r})
                return c + (jnp.sum(out.astype(jnp.float32)) + kl) * 0, c

        elif base == "losses":
            spec = L.parse_mel_loss("ssim:0.5|l1:0.5")
            fake = mels + 0.1

            def body(c, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    d: dict = {}
                    L.add_mel_losses(spec, fake + c * 0, mels, d)
                return c + sum(d.values()) * 0, c

        elif base == "disc_fwd":
            mod = MultiWindowDiscriminator(
                time_lengths=(32, 64, 128), freq_length=80, hidden_size=128)
            lengths = jnp.full((b,), TM, jnp.int32)
            params = mod.init(
                {"params": jax.random.PRNGKey(0)}, mels, lengths,
                rng=jax.random.PRNGKey(1))["params"]

            def body(c, r):
                with amp_scope("bfloat16", jnp.bfloat16):
                    out = mod.apply(
                        {"params": params}, mels + c * 0, lengths, rng=r,
                        deterministic=False, rngs={"dropout": r})
                return c + jnp.sum(out["y"].astype(jnp.float32)) * 0, c

        else:
            raise SystemExit(f"unknown piece {name}")

        return body

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
            body = piece_fn(name)

            @jax.jit
            def chain(c0, rng, body=body):
                rngs = jax.random.split(rng, N)
                c, _ = jax.lax.scan(body, c0, rngs)
                return c

            float(chain(jnp.float32(0), jax.random.PRNGKey(1)))  # compile
            reps = []
            for i in range(3):
                t0 = time.perf_counter()
                float(chain(jnp.float32(i), jax.random.PRNGKey(2 + i)))
                reps.append(time.perf_counter() - t0)
            best = min(reps)
            print(json.dumps({
                "piece": name, "n_chain": N,
                "ms_per_step": round(1e3 * max(best - rtt, 0) / N, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"piece": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
