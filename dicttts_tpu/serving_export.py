"""AOT serving export: freeze the text->wav graph to StableHLO artifacts.

A deployment capability beyond the reference (which serves from a live
torch process): the trained acoustic model + vocoder are exported with
`jax.export` as serialized StableHLO per (B, T_w) bucket shape, with the
parameters baked in as constants. The resulting artifact directory is
self-contained — a serving process needs only jax + the artifact, no model
code, no checkpoint loading, no tracing/compile on the request path
(first call per bucket compiles the portable StableHLO for the local
backend; subsequent calls are cache-hits).

Layout:
    <out_dir>/manifest.json     buckets, shapes, config echo
    <out_dir>/b{B}_tw{Tw}.shlo  serialized export for that bucket

The exported function signature (per bucket):
    fn(word_tokens[B,Tw] i32, keys[B,Tw,L,E] f32, values[...], key_map,
       pinyin[B,Tw,P] i32, pinyin_map, pron_modified[B,Tw] i32, seed i32)
      -> (wav[B, max_frames*hop] f32, mel[B, max_frames, bins] f32,
          mel2word[B, max_frames] i32, pinyin_pred[B, Tw, P] f32)
"""

from __future__ import annotations

import json
import os

import numpy as np


def export_tts(
    cfg: dict,
    state: dict,
    vocoder=None,
    buckets: list[tuple[int, int]] = ((1, 32), (8, 64)),
    gloss_len: int = 96,
    pinyin_len: int = 8,
    out_dir: str = "export",
) -> str:
    """Export the jitted DictTTS test path (+ vocoder when given) for each
    (B, Tw) bucket. `state` is a trained task state (params_g required)."""
    import jax
    import jax.numpy as jnp

    from dicttts_tpu.train.tasks.dict_tts import DictTTSTask

    cfg = {k: v for k, v in cfg.items() if k != "use_device_dict_bank"}
    task = DictTTSTask(cfg)
    os.makedirs(out_dir, exist_ok=True)
    E = cfg.get("dict_embed_dim", 768)
    max_frames = cfg.get("max_frames", 512)
    hop = cfg.get("hop_size", 256)
    bins = cfg.get("audio_num_mel_bins", 80)
    # params become export constants: the artifact is self-contained (the
    # exported graph takes explicit per-batch dict arrays, not the device
    # bank, so artifacts work on hosts without the binarized corpus)
    state_const = {"params_g": state["params_g"], "step": np.zeros((), np.int32)}

    def make_fn():
        def fn(word_tokens, keys, values, key_map, pinyin, pinyin_map, pron_modified, seed):
            batch = {
                "word_tokens": word_tokens, "keys": keys, "values": values,
                "key_map": key_map, "pinyin": pinyin, "pinyin_map": pinyin_map,
                "pron_modified": pron_modified,
            }
            out = task.test_step(state_const, batch, jax.random.PRNGKey(seed))
            mel = out["mel_out"]
            res = [mel, out["mel2word"].astype(jnp.int32), out["pinyin_pred"]]
            if vocoder is not None:
                wav = vocoder(mel)
                res = [wav] + res
            return tuple(res)

        return fn

    manifest = {
        "buckets": [list(b) for b in buckets],
        "gloss_len": gloss_len, "pinyin_len": pinyin_len,
        "max_frames": max_frames, "hop_size": hop, "mel_bins": bins,
        "embed_dim": E, "has_vocoder": vocoder is not None,
        "sample_rate": cfg.get("audio_sample_rate", 22050),
    }
    for B, Tw in buckets:
        args = (
            jnp.zeros((B, Tw), jnp.int32),
            jnp.zeros((B, Tw, gloss_len, E), jnp.float32),
            jnp.zeros((B, Tw, gloss_len, E), jnp.float32),
            jnp.zeros((B, Tw, gloss_len), jnp.int32),
            jnp.zeros((B, Tw, pinyin_len), jnp.int32),
            jnp.zeros((B, Tw, pinyin_len), jnp.int32),
            jnp.zeros((B, Tw), jnp.int32),
            jnp.int32(0),
        )
        exp = jax.export.export(jax.jit(make_fn()))(*args)
        with open(os.path.join(out_dir, f"b{B}_tw{Tw}.shlo"), "wb") as f:
            f.write(exp.serialize())
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


class ExportedTTS:
    """Load an export_tts artifact and serve from it (no model code)."""

    def __init__(self, artifact_dir: str):
        import jax

        self.dir = artifact_dir
        self.manifest = json.load(open(os.path.join(artifact_dir, "manifest.json")))
        self._fns = {}
        self._jax = jax

    def _fn_for(self, B: int, Tw: int):
        import jax

        # smallest bucket that fits
        fit = sorted(
            (b, tw) for b, tw in map(tuple, self.manifest["buckets"]) if b >= B and tw >= Tw
        )
        if not fit:
            raise ValueError(f"no exported bucket fits (B={B}, Tw={Tw}); "
                             f"have {self.manifest['buckets']}")
        key = fit[0]
        if key not in self._fns:
            with open(os.path.join(self.dir, f"b{key[0]}_tw{key[1]}.shlo"), "rb") as f:
                self._fns[key] = jax.export.deserialize(f.read())
        return key, self._fns[key]

    def __call__(self, word_tokens, keys, values, key_map, pinyin, pinyin_map,
                 pron_modified, seed: int = 0):
        B, Tw = np.shape(word_tokens)
        (Bb, Twb), fn = self._fn_for(B, Tw)
        L, P = self.manifest["gloss_len"], self.manifest["pinyin_len"]
        E = self.manifest["embed_dim"]

        def fit(x, shape, dtype):
            out = np.zeros(shape, dtype)
            sl = tuple(slice(0, min(a, b)) for a, b in zip(np.shape(x), shape))
            out[sl] = np.asarray(x)[sl]
            return out

        args = (
            fit(word_tokens, (Bb, Twb), np.int32),
            fit(keys, (Bb, Twb, L, E), np.float32),
            fit(values, (Bb, Twb, L, E), np.float32),
            fit(key_map, (Bb, Twb, L), np.int32),
            fit(pinyin, (Bb, Twb, P), np.int32),
            fit(pinyin_map, (Bb, Twb, P), np.int32),
            fit(pron_modified, (Bb, Twb), np.int32),
            np.int32(seed),
        )
        out = fn.call(*args)
        return tuple(np.asarray(o)[:B] for o in out)


def main(argv=None):
    """CLI: export a trained experiment's serving artifact.

    python -m dicttts_tpu.serving_export --config <cfg> --exp_name <exp> \
        [--out <dir>] [--buckets 1x32,8x64]
    """
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--exp_name", required=True)
    p.add_argument("--out", default="")
    p.add_argument("--buckets", default="1x32,8x64")
    args = p.parse_args(argv)

    import jax

    from dicttts_tpu.config import load_config
    from dicttts_tpu.run import autoconfigure_vocabs
    from dicttts_tpu.train.tasks.dict_tts import DictTTSTask
    from dicttts_tpu.utils.checkpoint import get_last_checkpoint, restore_checkpoint

    cfg = load_config(config=args.config, exp_name=args.exp_name, save=False, infer=True)
    autoconfigure_vocabs(cfg)
    cfg.pop("use_device_dict_bank", None)
    task = DictTTSTask(cfg)
    state = task.build_state(jax.random.PRNGKey(0))
    last = get_last_checkpoint(cfg.get("work_dir", ""))
    assert last, f"no checkpoint under {cfg.get('work_dir')!r}"
    _, state = restore_checkpoint(last, state)
    buckets = [tuple(map(int, b.split("x"))) for b in args.buckets.split(",")]
    out = args.out or os.path.join(cfg["work_dir"], "export")
    print(export_tts(cfg, state, buckets=buckets, out_dir=out))


if __name__ == "__main__":
    main()
