"""One-shot synthesis: Chinese text -> waveform.

The user-facing inference API (the reference's `--infer` path condensed):
normalizes text, builds word tokens + the per-utterance dictionary bank
from the binarized dict_embed, runs DictTTS (predicted durations, sampled
prior), vocodes with HiFi-GAN, and returns/saves the wav plus the predicted
pinyin per character (for PER scoring).

    from dicttts_tpu.infer import DictTTSInferencer
    inf = DictTTSInferencer(cfg)            # loads newest ckpt + vocoder
    wav, info = inf.synthesize("今天天气真好")
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.data.collate import shape_bucket
from dicttts_tpu.models.dict_encoder import DictMsg
from dicttts_tpu.text.pinyin import ZhG2P, load_dict
from dicttts_tpu.text.sandhi import SandhiProcessor
from dicttts_tpu.train.tasks.dict_tts import DictTTSTask
from dicttts_tpu.utils.checkpoint import get_last_checkpoint, restore_checkpoint
from dicttts_tpu.utils.indexed_dataset import IndexedDataset
from dicttts_tpu.utils.text_encoder import TokenTextEncoder
from dicttts_tpu.vocoders import get_vocoder_cls
from dicttts_tpu.vocoders.hifigan import save_wav


class DictTTSInferencer:
    def __init__(self, cfg: dict, state=None):
        self.cfg = cfg
        data_dir = cfg["binary_data_dir"]
        self.word_encoder = TokenTextEncoder(
            json.load(open(os.path.join(data_dir, "word_set.json"))), replace_oov="<UNK>"
        )
        with open(os.path.join(data_dir, "pinyin_encoder.pkl"), "rb") as f:
            self.pinyin_list = pickle.load(f)
        self.dict_ds = IndexedDataset(os.path.join(data_dir, "dict_embed"))
        self.g2p = ZhG2P(
            cfg.get("dict_path", "data/zh-dict.json"),
            pos_merge=cfg.get("txt_processor", "zh_dict") == "zh_dict",
            strict_nsw=bool(cfg.get("nsw_strict_reference", False)),
        )
        self.sandhi = SandhiProcessor(load_dict(cfg.get("dict_path", "data/zh-dict.json")))
        self.task = DictTTSTask(cfg)
        if state is None:
            state = self.task.build_state(jax.random.PRNGKey(0))
            last = get_last_checkpoint(cfg.get("work_dir", ""))
            if last:
                _, state = restore_checkpoint(last, state)
        self.state = state
        self.vocoder = get_vocoder_cls(cfg.get("vocoder", "HifiGanVocoder"))(cfg)
        self._jit_test = jax.jit(self.task.test_step)

    def _bank_for(self, chars: list[str]) -> dict:
        """Per-char dict bank for the REAL chars only; BOS/EOS rows are then
        added exactly like the training collater (data/datasets.py
        _dict_bank: zero key/pinyin rows, key/pinyin maps padded with 1) so
        the inference input distribution matches training."""
        keys, key_map, pinyin, pinyin_map = [], [], [], []
        for ch in chars:
            idx = self.word_encoder.token_to_id.get(ch, 2)
            e = self.dict_ds[idx]
            keys.append(np.asarray(e["key"], np.float32))
            key_map.append(np.asarray(e["key_map"], np.int64))
            pinyin.append(np.asarray([self.pinyin_list.index(p) for p in e["pinyin"]], np.int64))
            pinyin_map.append(np.asarray(e["pinyin_map"], np.int64))
        L = max(k.shape[0] for k in keys)
        P = max(p.shape[0] for p in pinyin)
        E = keys[0].shape[-1]
        n = len(chars)
        out = {
            "keys": np.zeros((n, L, E), np.float32),
            "key_map": np.zeros((n, L), np.int64),
            "pinyin": np.zeros((n, P), np.int64),
            "pinyin_map": np.zeros((n, P), np.int64),
        }
        for i in range(n):
            out["keys"][i, : keys[i].shape[0]] = keys[i]
            out["key_map"][i, : key_map[i].shape[0]] = key_map[i]
            out["pinyin"][i, : pinyin[i].shape[0]] = pinyin[i]
            out["pinyin_map"][i, : pinyin_map[i].shape[0]] = pinyin_map[i]
        # BOS/EOS pad rows (training-collater convention)
        out["keys"] = np.pad(out["keys"], ((1, 1), (0, 0), (0, 0)))
        out["key_map"] = np.pad(out["key_map"], ((1, 1), (0, 0)), constant_values=1)
        out["pinyin"] = np.pad(out["pinyin"], ((1, 1), (0, 0)))
        out["pinyin_map"] = np.pad(out["pinyin_map"], ((1, 1), (0, 0)), constant_values=1)
        out["values"] = out["keys"]
        return out

    def _prepare(self, text: str) -> dict:
        """Text -> per-utterance features (unpadded)."""
        norm = self.g2p.preprocess(text)
        chars = list(norm)
        words = ["<BOS>"] + chars + ["<EOS>"]
        ids = self.word_encoder.encode(" ".join(words))
        pron = np.asarray([0] + self.sandhi.process_sandhi(norm, None) + [0], np.int32)
        return {"norm": norm, "chars": chars, "ids": ids, "pron": pron,
                "bank": self._bank_for(chars)}

    def _collate(self, feats: list[dict]) -> dict:
        """Pad a list of prepared utterances to shared bucket shapes (word,
        gloss, and pinyin axes all bucketed, so repeated serving calls reuse
        a small set of compiled graphs)."""
        B = len(feats)
        Tw = shape_bucket(max(len(f["ids"]) for f in feats), 8)
        L = shape_bucket(max(f["bank"]["keys"].shape[1] for f in feats), 8)
        P = shape_bucket(max(f["bank"]["pinyin"].shape[1] for f in feats), 4)
        E = feats[0]["bank"]["keys"].shape[-1]
        batch = {
            "word_tokens": np.zeros((B, Tw), np.int32),
            "pron_modified": np.zeros((B, Tw), np.int32),
            "keys": np.zeros((B, Tw, L, E), np.float32),
            "key_map": np.zeros((B, Tw, L), np.int32),
            "pinyin": np.zeros((B, Tw, P), np.int32),
            "pinyin_map": np.zeros((B, Tw, P), np.int32),
        }
        for b, f in enumerate(feats):
            n = len(f["ids"])
            bk = f["bank"]
            batch["word_tokens"][b, :n] = f["ids"]
            batch["pron_modified"][b, :n] = f["pron"]
            batch["keys"][b, :n, : bk["keys"].shape[1]] = bk["keys"]
            batch["key_map"][b, :n, : bk["key_map"].shape[1]] = bk["key_map"]
            batch["pinyin"][b, :n, : bk["pinyin"].shape[1]] = bk["pinyin"]
            batch["pinyin_map"][b, :n, : bk["pinyin_map"].shape[1]] = bk["pinyin_map"]
        batch["values"] = batch["keys"]
        return batch

    def _decode_pinyin(self, pinyin_pred_row: np.ndarray, n_chars: int) -> list[str]:
        """argmax 2-token windows -> syllables (reference decode format)."""
        from dicttts_tpu.eval.per import decode_pinyin_ids, merge_token_pairs

        toks = decode_pinyin_ids(pinyin_pred_row, n_chars, self.pinyin_list)
        return merge_token_pairs([t for t in toks if t != "<UNK>"])

    def synthesize_batch(self, texts: list[str], seed: int = 0,
                         out_wavs: list[str] | None = None) -> list[tuple]:
        """Batched serving path: ONE acoustic dispatch + ONE vocoder dispatch
        for the whole batch (bench.py measures ~1.6x per-chip throughput at
        B=16 vs B=1). Returns [(wav, info), ...] in input order."""
        if not texts:
            return []
        profile = self.cfg.get("profile_infer", False)
        from dicttts_tpu.eval.metrics import Timer

        feats = [self._prepare(t) for t in texts]
        batch = self._collate(feats)
        with Timer("acoustic", enable=profile):
            out = jax.device_get(self._jit_test(self.state, batch, jax.random.PRNGKey(seed)))
        n_frames = [int((out["mel2word"][b] > 0).sum()) for b in range(len(feats))]
        # one batched vocoder dispatch: crop to the longest real length
        # (don't vocode max_frames of padding) and silence-floor the padded
        # tails so they cannot bleed into real audio through the receptive
        # field
        t_crop = min(shape_bucket(max(n_frames), 64), out["mel_out"].shape[1])
        mel_b = out["mel_out"][:, :t_crop].copy()
        for b, n in enumerate(n_frames):
            mel_b[b, n:] = -6.0
        with Timer("vocoder", enable=profile):
            wav_b = self.vocoder.spec2wav(mel_b)
        if profile:
            print("| profile_infer totals:", {k: round(v, 4) for k, v in Timer.totals.items()})
        sr = self.cfg.get("audio_sample_rate", 22050)
        hop = self.cfg.get("hop_size", 256)
        results = []
        for b, f in enumerate(feats):
            wav = wav_b[b, : n_frames[b] * hop]
            info = {
                "mel": out["mel_out"][b, : n_frames[b]],
                "pinyin": self._decode_pinyin(out["pinyin_pred"][b], len(f["chars"])),
                "text": f["norm"],
                "n_frames": n_frames[b],
            }
            if out_wavs and out_wavs[b]:
                save_wav(out_wavs[b], wav, sr)
            results.append((wav, info))
        return results

    def synthesize(self, text: str, seed: int = 0, out_wav: str | None = None):
        # profile_infer: per-stage cumulative timers (reference utils.Timer
        # around encoder/fvae/vocoder, tasks/tts/dict_tts.py:198-209).
        # Timings here include one host sync each — see bench.py's note on
        # relay round-trip costs when interpreting absolute numbers.
        return self.synthesize_batch([text], seed=seed, out_wavs=[out_wav])[0]
