"""Serving B=1 latency attribution (VERDICT r4 next-round #5).

BENCH_r04 reported p50 B=1 = 45.4 ms against a 25.7 ms relay RTT and
~6.7 ms of device compute — ~13 ms unattributed. This script splits one
serving call (dispatch → acoustic → vocoder → int16 PCM pull) into
independently measured stages, mirroring the reference's profile_infer
per-stage timers (/root/reference/tasks/tts/dict_tts.py:198-209):

  rtt_small_ms        dispatch+pull of a 2-byte result from a trivial jit
                      (the pure round-trip floor)
  pull_extra_ms[n]    additional wall per result size (bytes/s of the pull
                      path at serving sizes)
  disp_extra_ms       dispatch+pull of the SAME 311 KB result from a
                      trivial program vs from a big executable — fixed
                      per-execution overhead of the serving graph itself
  acoustic_ms         scan-chained on-device acoustic infer (RTT-corrected)
  vocoder_ms          scan-chained on-device vocoder (RTT-corrected)
  serve_p50_ms        the end-to-end number (bench.py methodology)
  residual_ms         serve_p50 - rtt_small - pull_extra(311KB)
                      - acoustic - vocoder

Writes the breakdown as JSON on stdout; bench.py embeds the same keys under
GRAFT_BENCH_FULL=1. Usage:

    python scripts/serve_attrib.py [--n_chain 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def p50(fn, n=9):
    fn()  # compile / warm
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(i)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_chain", type=int, default=50)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from dicttts_tpu.models.dict_encoder import DictMsg
    from dicttts_tpu.models.dict_tts import DictTTS
    from dicttts_tpu.models.hifigan import HifiGanGenerator

    # bench.py serving geometry exactly
    B, Tw, Lk, Lp, E = 1, 38, 24, 4, 768
    MAX_FRAMES = 608
    HOP = 256
    N_WAV = MAX_FRAMES * HOP  # 155648 int16 samples = 311 KB

    rng = np.random.RandomState(0)
    model = DictTTS(word_vocab=8000, hidden_size=192, use_pallas_s2pa=False)
    voc = HifiGanGenerator()

    words = jnp.asarray(rng.randint(3, 8000, (B, Tw)).astype(np.int32))
    dm = DictMsg(
        jnp.asarray(rng.randn(B, Tw, Lk, E).astype(np.float32)),
        jnp.asarray(rng.randn(B, Tw, Lk, E).astype(np.float32)),
        jnp.asarray((rng.randint(0, 3, (B, Tw, Lk)) + (np.arange(Lk) == 0)).astype(np.int32)),
        jnp.asarray(rng.randint(1, 185, (B, Tw, Lp)).astype(np.int32)),
        jnp.asarray(np.tile([1, 1, 2, 2], (B, Tw, 1)).astype(np.int32)),
    )
    pron_mod = jnp.zeros((B, Tw), jnp.int32)
    mel2word = jnp.asarray(
        np.repeat(np.arange(1, Tw + 1), MAX_FRAMES // Tw)[None].repeat(B, 0).astype(np.int32)
    )
    mels0 = jnp.zeros((B, MAX_FRAMES, 80), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, words, dm, pron_mod, mel2word=mel2word, tgt_mels=mels0)["params"]
    voc_params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16), voc.init(jax.random.PRNGKey(2), mels0)["params"]
    )

    out = {}

    # -- transport floor ------------------------------------------------------
    @jax.jit
    def tiny(seed):
        return (seed * 0).astype(jnp.int16).reshape(1, 1)

    out["rtt_small_ms"] = round(1e3 * p50(lambda i=0: np.asarray(tiny(jnp.int32(i)))), 2)

    for nbytes, tag in ((65536, "64k"), (N_WAV * 2, "wav"), (2 * N_WAV * 2, "2xwav")):
        n = nbytes // 2

        @jax.jit
        def fill(seed, n=n):
            return jnp.full((1, n), 1, jnp.int16) * (seed * 0 + 1).astype(jnp.int16)

        out[f"pull_{tag}_ms"] = round(
            1e3 * p50(lambda i=0, f=fill: np.asarray(f(jnp.int32(i)))), 2)

    # -- on-device stage times (scan-chained, RTT-corrected) ------------------
    @jax.jit
    def probe(x):
        return x + 1.0

    rtt = p50(lambda i=0: float(probe(jnp.float32(i))))
    N = args.n_chain

    @jax.jit
    def acoustic_chain(params, key):
        def body(c, _):
            k = jax.random.fold_in(key, c.astype(jnp.int32))
            with jax.default_matmul_precision("bfloat16"):
                mel = model.apply(
                    {"params": params}, words, dm, pron_mod, infer=True,
                    max_frames=MAX_FRAMES, rngs={"sample": k})["mel_out"]
            return jnp.sum(mel).astype(jnp.float32) + c, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return c

    @jax.jit
    def vocoder_chain(voc_params, key):
        def body(c, _):
            mel = mels0.astype(jnp.bfloat16) + c.astype(jnp.bfloat16) * 1e-6
            with jax.default_matmul_precision("bfloat16"):
                wav = voc.apply({"params": voc_params}, mel)
            return jnp.sum(wav).astype(jnp.float32) + c, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return c

    key = jax.random.PRNGKey(3)
    t_ac = p50(lambda i=0: float(acoustic_chain(params, jax.random.fold_in(key, i))), 5)
    t_vc = p50(lambda i=0: float(vocoder_chain(voc_params, jax.random.fold_in(key, i))), 5)
    out["acoustic_ms"] = round(1e3 * max(t_ac - rtt, 0) / N, 2)
    out["vocoder_ms"] = round(1e3 * max(t_vc - rtt, 0) / N, 2)
    out["rtt_probe_ms"] = round(1e3 * rtt, 2)

    # -- the end-to-end serving call (bench.py shape) -------------------------
    @jax.jit
    def serve_once(params, voc_params, seed):
        with jax.default_matmul_precision("bfloat16"):
            mel = model.apply(
                {"params": params}, words, dm, pron_mod, infer=True,
                max_frames=MAX_FRAMES, rngs={"sample": jax.random.PRNGKey(seed)},
            )["mel_out"]
            wav = voc.apply({"params": voc_params}, mel.astype(jnp.bfloat16))
        return jnp.clip(wav.astype(jnp.float32) * 32767.0, -32768, 32767).astype(jnp.int16)

    out["serve_p50_ms"] = round(
        1e3 * p50(lambda i=0: np.asarray(serve_once(params, voc_params, jnp.int32(i)))), 2)

    # fixed per-execution overhead of the BIG executable: same 311 KB output,
    # same program, but the compute path short-circuited is impossible —
    # instead compare tiny-program pull vs big-program pull minus known
    # device compute
    pull_bytes_extra = out["pull_wav_ms"] - out["rtt_small_ms"]
    out["pull_bytes_extra_ms"] = round(pull_bytes_extra, 2)
    out["residual_ms"] = round(
        out["serve_p50_ms"] - out["rtt_small_ms"] - pull_bytes_extra
        - out["acoustic_ms"] - out["vocoder_ms"], 2)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
