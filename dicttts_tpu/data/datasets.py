"""Binary-backed datasets + batch providers (the online data pipeline).

Capability parity with /root/reference/tasks/tts/dataset_utils.py and
tasks/vocoder/dataset_utils.py: items come from the IndexedDataset binaries
written by the binarizer (same `.data/.idx` format as the reference, so
reference-produced corpora load directly):

- `TTSBinaryDataset` covers the Base/FastSpeech/Word/Dict feature sets via
  `kind` in {'base', 'fs', 'word', 'dict'}: mel, txt_token, mel2ph, f0/uv
  (norm-interp), words/ph2word/mel2word, the per-word dictionary bank
  (keys/values/key_map/pinyin/pinyin_map, BOS/EOS pad rows exactly like the
  reference collater) and sandhi pron_modified.
- `TTSBatchProvider` does length-sorted token-budget batching
  (batch_by_size) and pads every batch to STATIC bucket shapes
  (txt_buckets/mel_buckets) so XLA compiles once per bucket — the main
  TPU-side divergence from the reference's pad-to-longest (SURVEY.md §5).
- `VocoderDataset`: random max_samples wav crops with aligned mel windows.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import numpy as np

from dicttts_tpu.data.collate import (
    batch_by_size,
    collate_1d,
    collate_2d,
    collate_nd,
    ordered_indices,
    shape_bucket,
)
from dicttts_tpu.ops.pitch import norm_interp_f0
from dicttts_tpu.utils.indexed_dataset import IndexedDataset
from dicttts_tpu.utils.text_encoder import TokenTextEncoder


class TTSBinaryDataset:
    def __init__(self, data_dir: str, prefix: str, cfg: dict, kind: str = "dict"):
        self.data_dir = data_dir
        self.prefix = prefix
        self.cfg = cfg
        self.kind = kind
        base = os.path.join(data_dir, prefix)
        # prefer the native recordio corpus when present (convert once with
        # data/recordio.convert_indexed_dataset); falls back to the
        # reference-format pickle IndexedDataset
        if os.path.exists(base + ".rio"):
            from dicttts_tpu.data.recordio import RecordReader

            self.ds = RecordReader(base)
        else:
            self.ds = IndexedDataset(base)
        sizes_fn = os.path.join(data_dir, f"{prefix}_lengths.npy")
        self.sizes = (
            np.load(sizes_fn).tolist()
            if os.path.exists(sizes_fn)
            else [len(self.ds[i]["mel"]) for i in range(len(self.ds))]
        )
        self._dict_ds: Optional[IndexedDataset] = None
        self._light_cache: dict = {}
        self._word_encoder: Optional[TokenTextEncoder] = None
        self._pinyin_list: Optional[list] = None
        if kind == "dict" and cfg.get("use_dict", True):
            ws = json.load(open(os.path.join(data_dir, "word_set.json")))
            self._word_encoder = TokenTextEncoder(ws, replace_oov="<UNK>")
            with open(os.path.join(data_dir, "pinyin_encoder.pkl"), "rb") as f:
                self._pinyin_list = pickle.load(f)

    def __len__(self):
        return len(self.ds)

    def device_bank(self, max_gloss: int | None = None, max_pinyin: int | None = None,
                    dtype=None) -> dict:
        """Whole-vocab dictionary bank as dense arrays for DEVICE residency.

        The dict bank is a fixed function of the word vocab, so instead of
        assembling + shipping [B, T_w, L_k, 768] tensors host->device every
        batch (the dominant input-pipeline byte volume), the full
        [V, L_k, 768] bank uploads once and the jitted step gathers rows by
        word id on device — HBM gather bandwidth replaces PCIe/host traffic.
        BOS/EOS/pad rows are overridden to the training-collater convention
        (zero keys, map pad 1) so both paths see identical inputs.
        Returns {'keys','key_map','pinyin','pinyin_map'} ([V,L,E] fp16,
        [V,L], [V,P], [V,P]).
        """
        if dtype is None:
            import ml_dtypes

            dtype = ml_dtypes.bfloat16  # native TPU half type
        if self._dict_ds is None:
            self._dict_ds = IndexedDataset(os.path.join(self.data_dir, "dict_embed"))
        V = self._word_encoder.vocab_size
        entries = [self._dict_ds[i] for i in range(V)]
        L = max_gloss or shape_bucket(max(np.asarray(e["key"]).shape[0] for e in entries), 32)
        P = max_pinyin or shape_bucket(max(len(e["pinyin"]) for e in entries), 8)
        E = np.asarray(entries[0]["key"]).shape[-1]
        bank = {
            "keys": np.zeros((V, L, E), dtype),
            "key_map": np.zeros((V, L), np.int32),
            "pinyin": np.zeros((V, P), np.int32),
            "pinyin_map": np.zeros((V, P), np.int32),
        }
        for i, e in enumerate(entries):
            k = np.asarray(e["key"], np.float32)[:L]
            bank["keys"][i, : len(k)] = k.astype(dtype)
            km = np.asarray(e["key_map"], np.int32)[:L]
            bank["key_map"][i, : len(km)] = km
            py = np.asarray([self._pinyin_list.index(p) for p in e["pinyin"]], np.int32)[:P]
            bank["pinyin"][i, : len(py)] = py
            pm = np.asarray(e["pinyin_map"], np.int32)[:P]
            bank["pinyin_map"][i, : len(pm)] = pm
        # pad/BOS/EOS rows: collater convention (datasets._dict_bank)
        special = [0] + [
            self._word_encoder.token_to_id[t]
            for t in ("<BOS>", "<EOS>")
            if t in self._word_encoder.token_to_id
        ]
        for i in special:
            bank["keys"][i] = 0
            bank["key_map"][i] = 1
            bank["pinyin"][i] = 0
            bank["pinyin_map"][i] = 1
        return bank

    def device_frame_cache(self, max_frames: int | None = None,
                           mel_dtype=None) -> dict:
        """Whole-split per-frame arrays for DEVICE residency.

        The trainer's measured bottleneck at production geometry is the
        host->device transfer of the mel (f16 60x512x80 ~ 4.9 MB/step over
        a ~60 MB/s relay vs ~8 ms of ideal compute — bench.py r3), and on
        real TPU VMs it is still the dominant input-pipeline byte volume.
        Like the dict bank, the corpus' frame data is a fixed function of
        the item id: upload [N, T, 80] once and let the jitted step gather
        rows by item index — batches then carry int32 `item_idx` plus the
        small index/length arrays, replacing PCIe/host traffic with an HBM
        gather. Mels are stored in the collater's exact transfer dtype
        (f16 under amp) so the cached path is bit-identical to the host
        path. Returns {'mels' [N,T,80]} plus {'f0','uv' [N,T]} when
        use_pitch_embed. HBM cost ~ N*T*82*2 bytes at f16 (Biaobei-scale
        10k x 512 ~ 0.8 GB, well within a v5e's 16 GB).
        """
        cfg = self.cfg
        T = int(max_frames or cfg.get("max_frames", 1548))
        if mel_dtype is None:
            mel_dtype = (
                np.float16
                if cfg.get("mel_transfer_f16", bool(cfg.get("amp")))
                else np.float32
            )
        N = len(self.ds)
        n_mels = int(cfg.get("audio_num_mel_bins", 80))
        use_pitch = bool(cfg.get("use_pitch_embed"))
        cache = {"mels": np.zeros((N, T, n_mels), mel_dtype)}
        if use_pitch:
            cache["f0"] = np.zeros((N, T), np.float32)
            cache["uv"] = np.zeros((N, T), np.float32)
        for i in range(N):
            item = self.ds[i]
            mel = np.asarray(item["mel"], np.float32)[:T]
            cache["mels"][i, : len(mel)] = mel.astype(mel_dtype)
            if use_pitch and "f0" in item:
                f0, uv = norm_interp_f0(
                    np.asarray(item["f0"])[: len(mel)], cfg.get("pitch_norm", "log")
                )
                cache["f0"][i, : len(f0)] = f0
                cache["uv"][i, : len(uv)] = uv
        return cache

    def light_item(self, index: int) -> dict:
        """Memoized token-level sample for frame-ref batches (the
        use_device_frame_cache data path): the per-frame float tensors
        (mels/f0/uv) live in the device cache, so collate only needs the
        small index/length arrays — re-deserializing the full record (mel
        bytes dominate it) every epoch would make the host collate the
        trainer bottleneck at production geometry. First access pays the
        decode; later epochs serve from memory (~10 KB/item)."""
        cached = self._light_cache.get(index)
        if cached is None:
            s = self[index]
            for k in ("mels", "f0", "uv"):
                s.pop(k, None)
            self._light_cache[index] = cached = s
        return cached

    def _dict_bank(self, words: list) -> dict:
        """Assemble per-utterance dict-bank arrays for words[1:-1] (BOS/EOS
        rows become zero pads, key/pinyin maps pad with 1 as the reference
        collater does)."""
        if self._dict_ds is None:
            self._dict_ds = IndexedDataset(os.path.join(self.data_dir, "dict_embed"))
        keys, key_map, values, pinyin, pinyin_map, tokens_gloss = [], [], [], [], [], []
        for word in words[1:-1]:
            idx = self._word_encoder.token_to_id.get(word, 2)
            e = self._dict_ds[idx]
            keys.append(np.asarray(e["key"], np.float32))
            key_map.append(np.asarray(e["key_map"], np.int32))
            values.append(np.asarray(e["value"], np.float32))
            pinyin.append(np.asarray([self._pinyin_list.index(p) for p in e["pinyin"]], np.int32))
            pinyin_map.append(np.asarray(e["pinyin_map"], np.int32))
            tokens_gloss.append(e.get("tokens_gloss"))
        out = {
            "keys": collate_2d(keys),
            "key_map": collate_1d(key_map),
            "values": collate_2d(values),
            "pinyin": collate_1d(pinyin),
            "pinyin_map": collate_1d(pinyin_map),
            "tokens_gloss": tokens_gloss,
        }
        # BOS/EOS rows (reference pads (1,1) on the word axis; maps pad=1)
        out["keys"] = np.pad(out["keys"], ((1, 1), (0, 0), (0, 0)))
        out["values"] = np.pad(out["values"], ((1, 1), (0, 0), (0, 0)))
        out["key_map"] = np.pad(out["key_map"], ((1, 1), (0, 0)), constant_values=1)
        out["pinyin"] = np.pad(out["pinyin"], ((1, 1), (0, 0)))
        out["pinyin_map"] = np.pad(out["pinyin_map"], ((1, 1), (0, 0)), constant_values=1)
        return out

    def __getitem__(self, index: int) -> dict:
        item = self.ds[index]
        cfg = self.cfg
        max_frames = cfg.get("max_frames", 1548)
        mel = np.asarray(item["mel"], np.float32)[:max_frames]
        T = len(mel)
        sample = {
            "_idx": np.int32(index),
            "item_name": item.get("item_name", str(index)),
            "txt": item.get("txt", ""),
            "txt_tokens": np.asarray(item["phone"] if "phone" in item else item["txt_token"], np.int64)[
                : cfg.get("max_input_tokens", 1550)
            ],
            "mels": mel,
            "mel_lengths": np.int32(T),
        }
        if self.kind in ("fs", "word", "dict"):
            if "mel2ph" in item:
                sample["mel2ph"] = np.asarray(item["mel2ph"], np.int64)[:T]
            if cfg.get("use_pitch_embed") and "f0" in item:
                f0, uv = norm_interp_f0(np.asarray(item["f0"])[:T], cfg.get("pitch_norm", "log"))
                sample["f0"], sample["uv"] = f0, uv
        if cfg.get("use_spk_id"):
            sample["spk_ids"] = np.int64(item.get("spk_id", 0))
        if self.kind in ("word", "dict"):
            sample["words"] = item["words"]
            sample["word_tokens"] = np.asarray(item["word_tokens"], np.int64)
            sample["word_lengths"] = np.int32(len(item["word_tokens"]))
            sample["mel2word"] = np.asarray(item["mel2word"], np.int64)[:T]
            sample["ph2word"] = np.asarray(item["ph2word"], np.int64)[: cfg.get("max_input_tokens", 1550)]
            if "pron_modified" in item:
                sample["pron_modified"] = np.asarray(item["pron_modified"], np.int64)
        if (
            self.kind == "dict"
            and self._word_encoder is not None
            and not cfg.get("use_device_dict_bank")
        ):
            sample.update(self._dict_bank(item["words"]))
        return sample


class TTSBatchProvider:
    """Token-budget batches padded to static bucket shapes."""

    NON_ARRAY_KEYS = ("item_name", "txt", "words", "tokens_gloss")

    def __init__(self, dataset: TTSBinaryDataset, cfg: dict, shuffle: bool = True,
                 devices_multiple: int = 1, emit_frame_refs: bool = False):
        self.ds = dataset
        self.cfg = cfg
        self.shuffle = shuffle
        self.devices_multiple = devices_multiple
        # device-resident frame cache (use_device_frame_cache): this
        # provider's batches carry int32 item_idx instead of the per-frame
        # float tensors (mels/f0/uv); the task gathers them from the
        # state-resident cache inside the jitted step. Set on the TRAIN
        # provider only — validation/test stream normally.
        self.emit_frame_refs = emit_frame_refs

    def _make_batches(self):
        sizes = self.ds.sizes
        order = ordered_indices(
            sizes, shuffle=self.shuffle, sort_by_len=self.cfg.get("sort_by_len", True),
            seed=self.cfg.get("seed", 1234),
        )
        min_frames = self.cfg.get("min_frames", 0)
        order = [i for i in order if sizes[i] >= min_frames]
        return batch_by_size(
            order,
            lambda i: min(sizes[i], self.cfg.get("max_frames", 1548)),
            max_tokens=self.cfg.get("max_tokens", 30000),
            max_sentences=self.cfg.get("max_sentences", 100000),
            required_batch_size_multiple=self.devices_multiple,
        )

    def collate(self, samples: list[dict]) -> dict:
        cfg = self.cfg
        txt_b = tuple(cfg.get("txt_buckets", ())) or None
        mel_b = tuple(cfg.get("mel_buckets", ())) or None
        t_txt = shape_bucket(max(len(s["txt_tokens"]) for s in samples), 16, txt_b)
        # mel_lengths == the truncated mel's length (dataset __getitem__), so
        # the bucket is identical whether or not the sample carries the mel
        # (light_item drops it in frame-ref mode)
        t_mel = shape_bucket(max(int(s["mel_lengths"]) for s in samples), 64, mel_b)
        fm = cfg.get("frames_multiple", 1)
        t_mel = ((t_mel + fm - 1) // fm) * fm
        # shape_bucket may return its LAST bucket for oversized items — the
        # contract is that the collater truncates to it (data/collate.py)
        # host->device transfer is the trainer's bottleneck once compute is
        # optimized: index arrays go as int32, and under the bf16 matmul
        # policy (amp) the mel goes as float16 — the f16 rounding (2^-11
        # relative) is below the bf16 compute rounding (2^-8), so upcasting
        # to f32 on device (adv_base.upcast_transfer_dtypes) loses nothing
        # while halving the dominant tensor's bytes
        mel_dtype = (
            np.float16
            if cfg.get("mel_transfer_f16", bool(cfg.get("amp")))
            else np.float32
        )
        batch = {
            "txt_tokens": collate_1d(
                [s["txt_tokens"][:t_txt] for s in samples], max_len=t_txt, dtype=np.int32
            ),
            "mel_lengths": np.asarray([min(int(s["mel_lengths"]), t_mel) for s in samples], np.int32),
            "txt_lengths": np.asarray([min(len(s["txt_tokens"]), t_txt) for s in samples], np.int32),
        }
        if self.emit_frame_refs:
            # frame tensors resolve on device from the item-indexed cache;
            # mel2ph/mel2word stay host-side (small int32, and they carry
            # the batch's T_mel bucket shape into the jitted step)
            batch["item_idx"] = np.asarray([int(s["_idx"]) for s in samples], np.int32)
        else:
            batch["mels"] = collate_2d(
                [s["mels"][:t_mel] for s in samples], max_len=t_mel, dtype=mel_dtype
            )
            for key in ("f0", "uv"):
                if key in samples[0]:
                    batch[key] = collate_1d([s[key][:t_mel] for s in samples], max_len=t_mel)
        # frame-ref mode: the dict/word tasks consume only mel2word and the
        # ph-level tasks only mel2ph — skip the other one (a [B, T_mel] int
        # array is the batch's biggest remaining transfer), and ship as
        # int16 (word/ph indices < 32768 by the txt bucket bound; the task
        # upcasts in-jit, adv_base.upcast_transfer_dtypes)
        align_keys = ("mel2ph", "mel2word")
        if self.emit_frame_refs and "mel2word" in samples[0]:
            align_keys = ("mel2word",)
        align_dtype = np.int16 if self.emit_frame_refs else np.int32
        for key in align_keys:
            if key in samples[0]:
                batch[key] = collate_1d(
                    [s[key][:t_mel] for s in samples], max_len=t_mel, dtype=align_dtype
                )
        if "spk_ids" in samples[0]:
            batch["spk_ids"] = np.asarray([int(s["spk_ids"]) for s in samples], np.int32)
        batch["_meta"] = [
            {k: s.get(k) for k in self.NON_ARRAY_KEYS if k in s} for s in samples
        ]
        if "word_tokens" in samples[0]:
            t_w = shape_bucket(max(len(s["word_tokens"]) for s in samples), 16, txt_b)
            batch["word_tokens"] = collate_1d(
                [s["word_tokens"][:t_w] for s in samples], max_len=t_w, dtype=np.int32
            )
            batch["ph2word"] = collate_1d(
                [s["ph2word"][:t_txt] for s in samples], max_len=t_txt, dtype=np.int32
            )
            batch["word_lengths"] = np.asarray(
                [min(int(s["word_lengths"]), t_w) for s in samples], np.int32
            )
            if "pron_modified" in samples[0]:
                batch["pron_modified"] = collate_1d(
                    [s["pron_modified"][:t_w] for s in samples], max_len=t_w, dtype=np.int32
                )
            if "keys" in samples[0]:
                # bucket the gloss (L_k) and pinyin (L_p) axes too — padding
                # them to the batch max would give nearly every batch a fresh
                # shape and recompile the jitted train step (SURVEY §7
                # demands (T_txt, T_mel, L_gloss) bucketing)
                gloss_b = tuple(cfg.get("gloss_buckets", ())) or None
                piny_b = tuple(cfg.get("pinyin_buckets", ())) or None
                l_k = shape_bucket(
                    max(s["keys"].shape[1] for s in samples), 32, gloss_b
                )
                l_p = shape_bucket(
                    max(s["pinyin"].shape[1] for s in samples), 8, piny_b
                )
                for key in ("keys", "values"):
                    arr = collate_nd([s[key][:t_w, :l_k] for s in samples], max_lens=(t_w, l_k, None))
                    batch[key] = arr.astype(np.float32)
                batch["key_map"] = collate_nd(
                    [s["key_map"][:t_w, :l_k] for s in samples],
                    max_lens=(t_w, l_k), dtype=np.int32,
                )
                for key in ("pinyin", "pinyin_map"):
                    batch[key] = collate_nd(
                        [s[key][:t_w, :l_p] for s in samples],
                        max_lens=(t_w, l_p), dtype=np.int32,
                    )
        return batch

    def _pad_sentence_bucket(self, batch: dict) -> dict:
        """Pad the SENTENCE axis to a configured bucket (cfg
        'sentence_buckets', e.g. [60]) so ragged trailing batches reuse the
        full-batch compiled graph instead of compiling a fresh shape — at
        production geometry a distinct batch size costs a multi-minute
        XLA compile through this environment's relay. Pad rows are all-zero
        (tokens/mels/lengths), the same masked convention the device-
        multiple padding already uses (parallel/mesh.pad_batch_to_devices)."""
        buckets = self.cfg.get("sentence_buckets") or None
        if not buckets:
            return batch
        # txt_tokens is present in both transfer modes (frame-ref batches
        # carry item_idx instead of mels); pad rows are all-zero, so a
        # padded item_idx gathers item 0's (masked-out) frames — harmless
        n = int(np.shape(batch["txt_tokens"])[0])
        fit = [b for b in sorted(buckets) if b >= n]
        if not fit or fit[0] == n:
            return batch
        pad = fit[0] - n
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n:
                out[k] = np.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
            else:
                out[k] = v
        return out

    def _iter(self):
        batches = self._make_batches()
        can_prefetch = hasattr(self.ds.ds, "prefetch")
        for n, idx_batch in enumerate(batches):
            if not idx_batch:
                continue
            if can_prefetch and n + 1 < len(batches):
                self.ds.ds.prefetch(batches[n + 1])  # warm next batch's pages
            get = self.ds.light_item if (
                self.emit_frame_refs and hasattr(self.ds, "light_item")
            ) else self.ds.__getitem__
            yield self._pad_sentence_bucket(self.collate([get(i) for i in idx_batch]))

    def train_batches(self):
        return self._iter()

    def val_batches(self):
        return self._iter()

    def test_batches(self):
        return self._iter()


class VocoderDataset:
    """Random wav/mel crop pairs for vocoder training (reference
    tasks/vocoder/dataset_utils.py:49-177)."""

    def __init__(self, data_dir: str, prefix: str, cfg: dict, batch_size: int = 24, seed: int = 1234):
        self.ds = IndexedDataset(os.path.join(data_dir, prefix))
        self.cfg = cfg
        self.batch_size = batch_size
        self.hop = cfg.get("hop_size", 256)
        self.max_samples = cfg.get("max_samples", 8192)
        self.seed = seed
        self.rng = np.random.RandomState(seed)

    def _crop(self, item, rng) -> tuple[np.ndarray, np.ndarray]:
        wav = np.asarray(item["wav"], np.float32)
        mel = np.asarray(item["mel"], np.float32)
        mel_win = self.max_samples // self.hop
        if mel.shape[0] > mel_win:
            start = rng.randint(0, mel.shape[0] - mel_win)
        else:
            start = 0
        mel_c = mel[start : start + mel_win]
        wav_c = wav[start * self.hop : (start + mel_win) * self.hop]
        if mel_c.shape[0] < mel_win:  # right-pad short clips
            mel_c = np.pad(mel_c, ((0, mel_win - mel_c.shape[0]), (0, 0)))
            wav_c = np.pad(wav_c, (0, self.max_samples - len(wav_c)))
        return wav_c, mel_c

    def _batches(self, deterministic: bool = False):
        """deterministic=True (validation/test): sequential order and a
        FIXED per-item crop offset (seeded by item index, independent of
        how often the iterator runs) so two consecutive validations on an
        unchanged model produce identical losses and best-ckpt selection is
        meaningful (VERDICT r2 weak #4; reference uses a deterministic
        per-split dataset, tasks/vocoder/dataset_utils.py:49-177).
        Training keeps the advancing RNG: fresh shuffles + fresh crops."""
        if deterministic:
            order = np.arange(len(self.ds))
            rng_for = lambda j: np.random.RandomState(self.seed + 7919 * (int(j) + 1))
        else:
            order = self.rng.permutation(len(self.ds))
            rng_for = lambda j: self.rng
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            wavs, mels = zip(
                *[self._crop(self.ds[j], rng_for(j)) for j in order[i : i + self.batch_size]]
            )
            yield {"wavs": np.stack(wavs), "mels": np.stack(mels)}

    def train_batches(self):
        return self._batches()

    def val_batches(self):
        return self._batches(deterministic=True)

    def test_batches(self):
        return self._batches(deterministic=True)
