"""Benchmark: end-to-end text->waveform real-time factor on one TPU chip.

Measures the flagship path (DictTTS acoustic inference at realistic Biaobei
dims -> HiFi-GAN vocoder) and prints ONE JSON line. Baseline target (see
BASELINE.md): RTF <= 0.01 per utterance on v5e-1; `vs_baseline` is
0.01 / measured_rtf, so > 1.0 beats the target.
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

    rng = np.random.RandomState(0)
    model = DictTTS(word_vocab=8000, hidden_size=192)
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
    # fixed mel2word so the synthesized audio length is deterministic
    mel2word = jnp.asarray(
        np.repeat(np.arange(1, Tw + 1), MAX_FRAMES // Tw)[None].repeat(B, 0).astype(np.int32)
    )
    mels0 = jnp.zeros((B, MAX_FRAMES, 80), jnp.float32)

    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, words, dm, pron_mod, mel2word=mel2word, tgt_mels=mels0)["params"]
    voc_params = voc.init(jax.random.PRNGKey(2), mels0)["params"]

    # two jits (acoustic / vocoder): halves peak compile memory and lets the
    # persistent cache hit each piece independently
    @jax.jit
    def text_to_mel(params, words, dm, pron_mod, key):
        out = model.apply(
            {"params": params}, words, dm, pron_mod, infer=True,
            max_frames=MAX_FRAMES, rngs={"sample": key},
        )
        return out["mel_out"]

    @jax.jit
    def mel_to_wav(voc_params, mel):
        return voc.apply({"params": voc_params}, mel)

    def text_to_wav(params, voc_params, words, dm, pron_mod, key):
        return mel_to_wav(voc_params, text_to_mel(params, words, dm, pron_mod, key))

    # warmup/compile
    key = jax.random.PRNGKey(3)
    wav = text_to_wav(params, voc_params, words, dm, pron_mod, key)
    jax.block_until_ready(wav)

    # per-utterance latency: block every iteration (no async pipelining)
    n_iters = 20
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        wav = text_to_wav(params, voc_params, words, dm, pron_mod, jax.random.fold_in(key, i))
        jax.block_until_ready(wav)
        times.append(time.perf_counter() - t0)
    elapsed = float(np.median(times))

    audio_secs = MAX_FRAMES * HOP / SR * B
    rtf = elapsed / audio_secs
    frames_per_sec = MAX_FRAMES * B / elapsed
    result = {
        "metric": "text_to_wav_rtf",
        "value": round(rtf, 6),
        "unit": "s_compute_per_s_audio",
        "vs_baseline": round(0.01 / rtf, 4),
        "extra": {
            "p50_utterance_latency_ms": round(elapsed * 1000, 2),
            "mel_frames_per_sec_per_chip": round(frames_per_sec, 1),
            "audio_secs_per_utt": round(audio_secs, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
