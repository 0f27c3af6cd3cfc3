"""Honest PER artifact: heteronym-rich, sandhi-exercising corpus →
CLI train → CLI --infer → reference-semantics PER scoring (VERDICT r3
next-round #3).

The real Biaobei corpus, MFA artifacts and pretrained checkpoints are not in
this sandbox (zero egress), so the published PER ≈ 1.93 % anchor
(/root/reference/readme.md:117) cannot be reproduced literally. This script
builds the strongest achievable proxy and DOCUMENTS ITS PROVENANCE:

* Characters and pronunciations come from the REAL zh-dict
  (/root/reference/data/zh-dict.json, 7030 entries — a data asset, read at
  runtime, never copied into the tree). Every target character is a genuine
  heteronym (>= 2 dictionary readings).
* Each sentence embeds heteronyms between context characters drawn from the
  GLOSS TEXT of the intended reading, so the correct pronunciation is only
  inferable from semantic context — the exact disambiguation task S2PA
  exists for (dict_encoder.py parity docs). A first-pronunciation baseline
  is computed and reported alongside; the corpus is constructed so that
  baseline is far from 0 % error.
* Tone sandhi runs for real: the generator applies the SAME
  text/sandhi.py engine the binarizer uses; where it forces a reading
  (不/一/neutral tone), the audio and the gold labels follow it.
* Audio is synthetic but PRONUNCIATION-FAITHFUL: every distinct syllable in
  the corpus gets a unique 3-partial harmonic signature (collision-free by
  construction), so the mel spectrogram fully determines the reading and
  mel-supervised training can learn the mapping. No vocoder realism is
  claimed and none is needed for PER.
* Scoring is the reference pipeline verbatim: --infer writes meta.csv in
  the reference pandas layout; labels are written in
  scripts/pron_label/label_set0.csv format; PER =
  eval/per.pron_error_rate_files (exact get_pron_error.py:8-48 semantics).

Writes PER_r04.json at the repo root. Usage:

    python scripts/per_eval.py [--max_updates 12000] [--n_items 800] [--fresh]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REAL_DICT = "/root/reference/data/zh-dict.json"
ROOT = os.path.join(REPO, ".per_corpus")
EXP_NAME = "per_eval_r04"


# -- corpus ------------------------------------------------------------------

def _select_heteronyms(zd, max_heteronyms: int):
    """Heteronym chars whose every reading has gloss text rich enough to
    supply single-pronunciation context characters."""
    single = {c for c in zd.entries if len(zd.prons(c)) == 1}
    het = []
    for c in zd.entries:
        prons = zd.prons(c)
        if len(prons) < 2:
            continue
        ok = True
        ctx = {}
        for p in prons:
            chars = [g for g in "".join(zd.glosses(c, p)) if g in single and g != c]
            # de-dup, keep order
            seen = []
            for g in chars:
                if g not in seen:
                    seen.append(g)
            if len(seen) < 4:
                ok = False
                break
            ctx[p] = seen[:24]
        if ok:
            het.append((c, ctx))
        if len(het) >= max_heteronyms:
            break
    return het, single


def _syllable_bank(syls: list[str]):
    """Unique (f0, f1, f2) harmonic signature per distinct syllable —
    enumerated, not hashed, so no two syllables share a spectrum."""
    bank = {}
    for i, s in enumerate(sorted(set(syls))):
        a, rem = i % 24, i // 24
        b, c = rem % 40, rem // 40
        bank[s] = (95.0 + a * 11.0, 900.0 + b * 82.0, 4300.0 + c * 90.0)
    return bank


def _render(syl_seq: list[str], bank, sr: int, secs_per_char: float) -> np.ndarray:
    segs = []
    n = int(sr * secs_per_char)
    t = np.arange(n) / sr
    env = np.minimum(1.0, np.minimum(np.arange(n), np.arange(n)[::-1]) / (0.012 * sr))
    for s in syl_seq:
        f0, f1, f2 = bank[s]
        w = (0.20 * np.sin(2 * np.pi * f0 * t)
             + 0.10 * np.sin(2 * np.pi * 2.0 * f0 * t)
             + 0.10 * np.sin(2 * np.pi * f1 * t)
             + 0.07 * np.sin(2 * np.pi * f2 * t))
        segs.append((w * env).astype(np.float32))
    segs.append(np.zeros(int(0.25 * sr), np.float32))
    return np.concatenate(segs)


def build_per_corpus(root: str, n_items: int, seed: int = 0,
                     max_heteronyms: int = 160, sr: int = 22050,
                     secs_per_char: float = 0.11):
    """Returns (binary_data_dir, gold: {item: [syllable...]}, stats)."""
    from dicttts_tpu.text.binarizer import PreAlign, ZhBinarizer
    from dicttts_tpu.text.pinyin import load_dict
    from dicttts_tpu.text.sandhi import SandhiProcessor
    from dicttts_tpu.vocoders.hifigan import save_wav

    zd = load_dict(REAL_DICT)
    sandhi = SandhiProcessor(zd)
    het, single = _select_heteronyms(zd, max_heteronyms)
    rng = np.random.RandomState(seed)

    # sandhi triggers: sprinkle 不/一 (their sandhi is context-dependent)
    triggers = [c for c in ("不", "一") if c in zd.entries]

    items = []  # (name, text, [reading chosen per char or None->first])
    for i in range(n_items):
        text, choice = [], []
        for _ in range(int(rng.randint(3, 6))):  # 3-5 heteronym slots
            c, ctx = het[rng.randint(len(het))]
            prons = zd.prons(c)
            r = int(rng.randint(len(prons)))
            support = ctx[prons[r]]
            k = int(rng.randint(3, 6))
            picks = [support[j] for j in rng.randint(0, len(support), k)]
            m = int(rng.randint(1, k))
            seg = picks[:m] + [c] + picks[m:]
            segc = [None] * m + [r] + [None] * (k - m)
            if triggers and rng.rand() < 0.25:
                j = int(rng.randint(len(seg) + 1))
                seg.insert(j, triggers[rng.randint(len(triggers))])
                segc.insert(j, None)
            text.extend(seg)
            choice.extend(segc)
        items.append((f"h{i:05d}", "".join(text), choice))

    # gold syllables: chosen reading for heteronym slots, first reading
    # elsewhere, then sandhi overrides applied EXACTLY as the binarizer does
    gold: dict[str, list[str]] = {}
    baseline: dict[str, list[str]] = {}  # first-pron + sandhi rule, no context
    n_sandhi = 0
    n_het_slots = 0
    n_first_correct = 0
    all_syls: list[str] = []
    for name, text, choice in items:
        mods = sandhi.process_sandhi(text)
        syls, base = [], []
        for j, ch in enumerate(text):
            prons = zd.prons(ch)
            r = choice[j] if choice[j] is not None else 0
            b = 0
            if j < len(mods) and mods[j] > 0 and mods[j] <= len(prons):
                r = b = mods[j] - 1
                n_sandhi += 1
            if choice[j] is not None:
                n_het_slots += 1
                n_first_correct += int(r == 0)
            syls.append(prons[r])
            base.append(prons[b])
        gold[name] = syls
        baseline[name] = base
        all_syls.extend(syls)
    bank = _syllable_bank(all_syls)

    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)

    class PerPreAlign(PreAlign):
        def meta_data(self):
            for name, text, _ in items:
                fn = os.path.join(raw, f"{name}.wav")
                if not os.path.exists(fn):
                    save_wav(fn, _render(gold[name], bank, sr, secs_per_char), sr)
                yield name, fn, text

    bdir = os.path.join(root, "binary")
    cfg = {
        "raw_data_dir": raw,
        "processed_data_dir": os.path.join(root, "processed"),
        "binary_data_dir": bdir,
        "dict_path": REAL_DICT,
        "word_size": 12000,
        "dict_embed_dim": 768,
        "test_num": 50,
        "valid_num": 20,
        "use_dict": True,
        "binarize_batch": 16,
        "audio_sample_rate": sr,
        "txt_processor": "zh_dict",
    }
    if not (os.path.exists(os.path.join(bdir, "train.idx"))
            and os.path.exists(os.path.join(bdir, "dict_embed.idx"))):
        PerPreAlign(cfg).process()
        ZhBinarizer(cfg).process()

    stats = {
        "n_items": n_items,
        "n_heteronym_chars": len(het),
        "heteronym_slots": n_het_slots,
        "sandhi_overrides_applied": n_sandhi,
        "first_pron_heteronym_acc": round(n_first_correct / max(n_het_slots, 1), 4),
        "distinct_syllables": len(bank),
    }
    return bdir, gold, baseline, stats


def write_labels(bdir: str, gold: dict, out_csv: str) -> int:
    """Gold labels for the TEST split, in split order, in the reference
    label_set0.csv layout (scored positionally against meta.csv rows)."""
    from dicttts_tpu.text.pinyin import pinyin_to_tone3
    from dicttts_tpu.utils.indexed_dataset import IndexedDataset

    ds = IndexedDataset(os.path.join(bdir, "test"))
    rows = []
    for i in range(len(ds)):
        item = ds[i]
        name = item["item_name"]
        phs = []
        for syl in gold[name]:
            ini, fin = pinyin_to_tone3(syl)
            phs.append(f"{ini} {fin}" if ini else fin)
        ph = "<BOS> " + " | ".join(phs) + " <EOS>"
        rows.append(f"{i},{name},SPK1,{item['txt']},{ph},{name}.wav,{{}}")
    with open(out_csv, "w", encoding="utf-8") as f:
        f.write(",item_name,spk,txt,ph,wav_fn,others\n")
        f.write("\n".join(rows) + "\n")
    return len(rows)


# -- train + infer + score -----------------------------------------------------

def write_config(bdir: str, max_updates: int) -> str:
    cfg = f"""\
base_config:
  - {REPO}/dicttts_tpu/configs/tts/dict_tts.yaml

binary_data_dir: {bdir}
dict_path: {REAL_DICT}
lm_model: ''
use_pitch_embed: false

max_sentences: 48
max_tokens: 26000
max_frames: 512
mel_buckets: [512]
txt_buckets: [40]
gloss_buckets: [128]
pinyin_buckets: [16]
sentence_buckets: [48]
frames_multiple: 4

max_updates: {max_updates}
val_check_interval: 2000
valid_infer_interval: 1000000000
num_sanity_val_steps: 2
eval_max_batches: 4
tb_log_interval: 200
steps_per_dispatch: 8
amp: true
use_device_dict_bank: true
use_device_frame_cache: true
disc_start_steps: {max_updates // 4}
"""
    fn = os.path.join(ROOT, "per.yaml")
    with open(fn, "w") as f:
        f.write(cfg)
    return fn


def heteronym_breakdown(labels_csv: str, meta_csv: str) -> dict:
    """Where do the errors live? Splits PER into single-pronunciation
    syllables (mechanics: should be ~0) vs heteronym slots (the actual
    disambiguation task), and reports what the model predicts at those
    slots vs the always-first-reading strategy."""
    import csv

    from dicttts_tpu.eval.per import load_label_set, load_meta_predictions
    from dicttts_tpu.text.pinyin import load_dict

    labels = load_label_set(labels_csv)
    preds = load_meta_predictions(meta_csv)
    zd = load_dict(REAL_DICT)
    rows = list(csv.DictReader(open(labels_csv, encoding="utf-8")))
    single_tot = single_err = het_tot = het_err = pred_first = 0
    for row, lab, pred in zip(rows, labels, preds):
        txt = row["txt"]
        if len(lab) != len(pred) or len(lab) != len(txt):
            continue  # alignment slips are counted by the headline PER only
        for ch, g, p in zip(txt, lab, pred):
            prons = zd.prons(ch) if ch in zd.entries else []
            if len(prons) >= 2:
                het_tot += 1
                het_err += int(g != p)
                pred_first += int(p == prons[0])
            else:
                single_tot += 1
                single_err += int(g != p)
    return {
        "single_pron_syllables": single_tot,
        "single_pron_errors": single_err,
        "heteronym_slots": het_tot,
        "heteronym_errors": het_err,
        "heteronym_acc_pct": round(100 * (1 - het_err / max(het_tot, 1)), 2),
        "model_predicts_first_reading_pct": round(100 * pred_first / max(het_tot, 1), 2),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max_updates", type=int, default=12000)
    ap.add_argument("--n_items", type=int, default=800)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing trained exp; just infer + score")
    ap.add_argument("--skip_infer", action="store_true",
                    help="reuse an existing meta.csv; just score")
    args = ap.parse_args()

    t0 = time.time()
    print("| per: building heteronym corpus from the real zh-dict...", flush=True)
    bdir, gold, baseline, stats = build_per_corpus(ROOT, args.n_items)
    labels_csv = os.path.join(ROOT, "labels.csv")
    n_test = write_labels(bdir, gold, labels_csv)

    # exact context-free baseline PER over the same test rows: first
    # dictionary reading everywhere + the rule-based sandhi overrides — what
    # any g2p without semantic disambiguation would score here
    from dicttts_tpu.eval.per import wer
    from dicttts_tpu.utils.indexed_dataset import IndexedDataset

    test_ds = IndexedDataset(os.path.join(bdir, "test"))
    test_names = [test_ds[i]["item_name"] for i in range(len(test_ds))]
    baseline_per = wer([gold[n] for n in test_names], [baseline[n] for n in test_names])
    print(f"| per: corpus ready ({stats}); {n_test} test items; "
          f"first-pron baseline PER {100 * baseline_per:.2f}%", flush=True)
    cfg_fn = write_config(bdir, args.max_updates)

    work_dir = os.path.join(REPO, "checkpoints", EXP_NAME)
    if args.fresh:
        shutil.rmtree(work_dir, ignore_errors=True)

    # PREPEND to PYTHONPATH: this image registers the TPU backend through a
    # sitecustomize on the existing path — clobbering it silently drops the
    # chip and the subprocess dies at jax.devices()
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    if not args.skip_train:
        print("| per: training via the CLI...", flush=True)
        t1 = time.time()
        with open(os.path.join(ROOT, "train.log"), "w") as logf:
            rc = subprocess.call(
                [sys.executable, "-m", "dicttts_tpu.run", "--config", cfg_fn,
                 "--exp_name", EXP_NAME], cwd=REPO, env=env,
                stdout=logf, stderr=subprocess.STDOUT)
        assert rc == 0, f"train rc={rc}; see {ROOT}/train.log"
        train_secs = time.time() - t1
    else:
        train_secs = None

    if not args.skip_infer:
        print("| per: inference via the CLI...", flush=True)
        t2 = time.time()
        with open(os.path.join(ROOT, "infer.log"), "w") as logf:
            rc = subprocess.call(
                [sys.executable, "-m", "dicttts_tpu.run", "--config", cfg_fn,
                 "--exp_name", EXP_NAME, "--infer"], cwd=REPO, env=env,
                stdout=logf, stderr=subprocess.STDOUT)
        assert rc == 0, f"infer rc={rc}; see {ROOT}/infer.log"
        infer_secs = time.time() - t2
    else:
        infer_secs = None

    from dicttts_tpu.eval.per import pron_error_rate_files

    meta_csv = os.path.join(work_dir, "generated", "meta.csv")
    per = pron_error_rate_files(meta_csv, labels_csv)

    result = {
        "per_pct": round(100 * per, 3),
        "reference_anchor_per_pct": 1.93,
        "n_test_items": n_test,
        "max_updates": args.max_updates,
        "train_secs": round(train_secs, 1) if train_secs else None,
        "infer_secs": round(infer_secs, 1) if infer_secs else None,
        "breakdown": heteronym_breakdown(labels_csv, meta_csv),
        "provenance": {
            "corpus": "synthetic sentences over the REAL zh-dict "
                      "(/root/reference/data/zh-dict.json, 7030 entries)",
            "task": "heteronym disambiguation from gloss-derived semantic "
                    "context; readings drawn uniformly per slot",
            "audio": "pronunciation-faithful 3-partial harmonic signatures, "
                     "one unique spectrum per distinct syllable",
            "gloss_features": "deterministic hash fallback (no RoFormer "
                              "weights in this sandbox)",
            "sandhi": "text/sandhi.py overrides applied to audio AND labels",
            "not_claimed": "Biaobei acoustics / MOS / the literal 1.93% "
                           "anchor — environment-blocked (no corpus, no "
                           "egress); this measures the S2PA pronunciation "
                           "machinery end-to-end on held-out sentences",
            **stats,
            "first_pron_baseline_per_pct": round(100 * baseline_per, 3),
        },
        "total_secs": round(time.time() - t0, 1),
    }
    with open(os.path.join(REPO, "PER_r04.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
