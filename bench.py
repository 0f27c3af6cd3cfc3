"""Benchmark: end-to-end text->waveform real-time factor on one TPU chip.

Measures the flagship path (DictTTS acoustic inference at Biaobei dims ->
HiFi-GAN vocoder, subpixel upsampling, bf16 MXU matmuls) and prints ONE
JSON line. Baseline target (BASELINE.md): RTF <= 0.01 per utterance on
v5e-1; `vs_baseline` = 0.01 / measured_rtf (> 1.0 beats the target).

Methodology note: this environment reaches the chip through a relay that
adds a fixed ~30-40 ms per host round-trip, and `block_until_ready`
returns early (measured sub-ms "latencies" that are physically
impossible). The benchmark therefore chains N data-dependent utterances
inside ONE jit (lax.scan), syncs once by pulling the result to host,
subtracts the separately measured round-trip, and divides by N — the
honest on-device compute per utterance.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: the heavy vocoder graph compiles once per
    # machine; subsequent bench runs (e.g. the driver's) start warm
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dicttts_tpu.models.dict_encoder import DictMsg
    from dicttts_tpu.models.dict_tts import DictTTS
    from dicttts_tpu.models.hifigan import HifiGanGenerator

    SR, HOP = 22050, 256
    B, Tw, Lk, Lp, E = 1, 38, 24, 4, 768  # ~38-char utterance
    MAX_FRAMES = 608  # = 38 words x 16 frames, ~7.06 s of audio
    N_CHAIN = 10

    rng = np.random.RandomState(0)
    model = DictTTS(word_vocab=8000, hidden_size=192, use_pallas_s2pa=True)
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
    voc_params = voc.init(jax.random.PRNGKey(2), mels0)["params"]

    @jax.jit
    def chain(params, voc_params, key):
        def body(carry, _):
            k = jax.random.fold_in(key, carry.astype(jnp.int32))
            with jax.default_matmul_precision("bfloat16"):
                mel = model.apply(
                    {"params": params}, words, dm, pron_mod, infer=True,
                    max_frames=MAX_FRAMES, rngs={"sample": k},
                )["mel_out"]
                wav = voc.apply({"params": voc_params}, mel)
            return jnp.sum(wav) + carry, None  # data dependency between iters
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return out

    @jax.jit
    def rtt_probe(x):
        return x + 1.0

    def p50(fn, n):
        fn()
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            fn(i)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    key = jax.random.PRNGKey(3)
    t_chain = p50(lambda i=0: float(chain(params, voc_params, jax.random.fold_in(key, i))), 10)
    rtt = p50(lambda i=0: float(rtt_probe(jnp.float32(i))), 10)

    per_utt = max((t_chain - rtt) / N_CHAIN, 1e-9)
    audio_secs = MAX_FRAMES * HOP / SR * B
    rtf = per_utt / audio_secs
    result = {
        "metric": "text_to_wav_rtf",
        "value": round(rtf, 6),
        "unit": "s_compute_per_s_audio",
        "vs_baseline": round(0.01 / rtf, 4),
        "extra": {
            "per_utt_compute_ms": round(per_utt * 1000, 2),
            "mel_frames_per_sec_per_chip": round(MAX_FRAMES * B / per_utt, 1),
            "audio_secs_per_utt": round(audio_secs, 3),
            "host_roundtrip_ms": round(rtt * 1000, 2),
            "chain_n": N_CHAIN,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
