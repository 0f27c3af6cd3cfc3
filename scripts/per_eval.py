"""Honest PER artifact: heteronym-rich, sandhi-exercising corpus →
CLI train → CLI --infer → reference-semantics PER scoring (VERDICT r3
next-round #3; r5 upgrades below).

The real Biaobei corpus, MFA artifacts and pretrained checkpoints are not in
this sandbox (zero egress), so the published PER ≈ 1.93 % anchor
(/root/reference/readme.md:117) cannot be reproduced literally. This script
builds the strongest achievable proxy and DOCUMENTS ITS PROVENANCE:

* Characters and pronunciations come from the REAL zh-dict
  (default /root/reference/data/zh-dict.json, 7030 entries — a data asset,
  read at runtime, never copied into the tree; point --dict at your own copy
  to run outside this sandbox).
* Each sentence embeds heteronyms between context characters drawn from the
  GLOSS TEXT of the intended reading, so the correct pronunciation is only
  inferable from semantic context — the exact disambiguation task S2PA
  exists for (dict_encoder.py parity docs). A first-pronunciation baseline
  is computed and reported alongside; the corpus is constructed so that
  baseline is far from 0 % error. Measured intrinsic (Bayes) ambiguity of
  the slot task is ~0.2 % — the corpus is decidable.
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

Round-5 changes (VERDICT r4 next-round #1/#2/#7):
* FIXED COMMITTED TEST SET: the 50 test sentences live in
  data/per_test_set.json (their own RNG stream, independent of the train
  stream), so --n_items can scale the train set while r5→r6 comparisons stay
  apples-to-apples. The file is written on first run and verified after.
* model_predicts_first_reading_pct now converts the dictionary's
  tone-marked first reading through pinyin_to_tone3 before comparing
  (the old stat compared "ka3" to "kǎ" — never equal).
* per-slot diagnostics: every heteronym slot in the test set is dumped
  (char, gold, pred, sandhi-forced?) to <root>/slot_diag.json with per-char
  aggregates, plus optional --score_train probe on held-in items to split
  optimization error from generalization error.

Writes PER_r05.json at the repo root. Usage:

    python scripts/per_eval.py [--max_updates 100000] [--n_items 6000]
        [--dict /path/to/zh-dict.json] [--score_train] [--fresh]
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

DEFAULT_DICT = "/root/reference/data/zh-dict.json"
ROOT = os.path.join(REPO, ".per_corpus")
TEST_SET_JSON = os.path.join(REPO, "data", "per_test_set.json")
N_TEST = 50
TEST_SEED = 12345


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


# Bank v2 (r5): v1 enumerated signatures as (i%24, i//24%40, ...) steps of
# 11 Hz in f0 — but a char's readings are usually ADJACENT in sorted order
# (tone-only pairs: liáng/liàng, jǐn/jìn, tái/tāi ...), so exactly the
# contrasts S2PA must learn differed by one 11 Hz step inside a single
# low-frequency mel bin: measured mean |Δlog10-mel| 0.10-0.18 between
# confused pairs vs 0.81 for far pairs. The audio could not TEACH those
# readings, capping heteronym accuracy at ~78 % in r5's first two runs
# (identical per-char error sets across configs). v2 assigns each syllable
# a distinct 3-subset of a 24-point mel-equidistant frequency grid — any
# two syllables differ by full presence/absence of >= 1 partial that the
# 80-bin mel filterbank resolves (grid spacing ~2.5 filters).
BANK_VERSION = 2


def _mel_scale(f):
    f = np.asarray(f, np.float64)
    return np.where(f < 1000.0, f / 66.6667,
                    15.0 + 27.0 * np.log(np.maximum(f, 1.0) / 1000.0) / np.log(6.4))


def _mel_inv(m):
    m = np.asarray(m, np.float64)
    return np.where(m < 15.0, m * 66.6667,
                    1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0))


def _syllable_bank(syls: list[str]):
    """Unique 3-partial signature per distinct syllable: the i-th
    3-combination of a 24-frequency mel-equidistant grid (C(24,3)=2024)."""
    import itertools

    grid = _mel_inv(np.linspace(_mel_scale(220.0), _mel_scale(7600.0), 24))
    combos = list(itertools.combinations(range(24), 3))
    uniq = sorted(set(syls))
    assert len(uniq) <= len(combos), f"{len(uniq)} syllables > C(24,3)"
    return {s: tuple(float(grid[c]) for c in combos[i]) for i, s in enumerate(uniq)}


def _render(syl_seq: list[str], bank, sr: int, secs_per_char: float) -> np.ndarray:
    segs = []
    n = int(sr * secs_per_char)
    t = np.arange(n) / sr
    env = np.minimum(1.0, np.minimum(np.arange(n), np.arange(n)[::-1]) / (0.012 * sr))
    for s in syl_seq:
        f0, f1, f2 = bank[s]
        w = (0.22 * np.sin(2 * np.pi * f0 * t)
             + 0.14 * np.sin(2 * np.pi * f1 * t)
             + 0.10 * np.sin(2 * np.pi * f2 * t))
        segs.append((w * env).astype(np.float32))
    segs.append(np.zeros(int(0.25 * sr), np.float32))
    return np.concatenate(segs)


def _gen_items(zd, het, rng, n_items: int, prefix: str):
    """Sentence generator (unchanged recipe since r4): 3-5 heteronym slots,
    each between 3-5 context chars drawn from the intended reading's gloss
    support, with 不/一 sandhi triggers sprinkled in."""
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
        items.append((f"{prefix}{i:05d}", "".join(text), choice))
    return items


def _fixed_test_items(zd, het):
    """The committed 50-sentence test set: generated from its own RNG stream
    (seed 12345) and persisted to data/per_test_set.json so train-set scale
    can change between rounds without moving the goalposts."""
    items = _gen_items(zd, het, np.random.RandomState(TEST_SEED), N_TEST, "t")
    ser = [{"name": n, "text": t, "choice": c} for n, t, c in items]
    if os.path.exists(TEST_SET_JSON):
        with open(TEST_SET_JSON, encoding="utf-8") as f:
            on_disk = json.load(f)
        assert on_disk == ser, (
            f"{TEST_SET_JSON} does not match the generator output — the dict "
            "or the recipe changed; delete the file to accept a NEW test set "
            "(breaks cross-round comparability)")
    else:
        os.makedirs(os.path.dirname(TEST_SET_JSON), exist_ok=True)
        with open(TEST_SET_JSON, "w", encoding="utf-8") as f:
            json.dump(ser, f, ensure_ascii=False, indent=0)
    return items


def build_per_corpus(root: str, n_items: int, dict_path: str, seed: int = 0,
                     max_heteronyms: int = 160, sr: int = 22050,
                     secs_per_char: float = 0.11):
    """Returns (binary_data_dir, gold: {item: [syllable...]}, stats)."""
    from dicttts_tpu.text.binarizer import PreAlign, ZhBinarizer
    from dicttts_tpu.text.pinyin import load_dict
    from dicttts_tpu.text.sandhi import SandhiProcessor
    from dicttts_tpu.vocoders.hifigan import save_wav

    zd = load_dict(dict_path)
    sandhi = SandhiProcessor(zd)
    het, single = _select_heteronyms(zd, max_heteronyms)
    rng = np.random.RandomState(seed)

    # test items FIRST (the binarizer takes test = rows[:test_num]), then the
    # train/valid stream — its RNG is independent of the test stream
    items = _fixed_test_items(zd, het)
    items += _gen_items(zd, het, rng, n_items, "h")

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

    raw = os.path.join(root, f"raw_v{BANK_VERSION}")
    os.makedirs(raw, exist_ok=True)

    class PerPreAlign(PreAlign):
        def meta_data(self):
            for name, text, _ in items:
                fn = os.path.join(raw, f"{name}.wav")
                if not os.path.exists(fn):
                    save_wav(fn, _render(gold[name], bank, sr, secs_per_char), sr)
                yield name, fn, text

    bdir = os.path.join(root, f"binary_n{n_items}_v{BANK_VERSION}")
    cfg = {
        "raw_data_dir": raw,
        "processed_data_dir": os.path.join(root, f"processed_n{n_items}_v{BANK_VERSION}"),
        "binary_data_dir": bdir,
        "dict_path": dict_path,
        "word_size": 12000,
        "dict_embed_dim": 768,
        "test_num": N_TEST,
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
        "n_test_items": N_TEST,
        "test_set": os.path.relpath(TEST_SET_JSON, REPO),
        "n_heteronym_chars": len(het),
        "heteronym_slots": n_het_slots,
        "sandhi_overrides_applied": n_sandhi,
        "first_pron_heteronym_acc": round(n_first_correct / max(n_het_slots, 1), 4),
        "distinct_syllables": len(bank),
    }
    return bdir, gold, baseline, stats


def write_labels(bdir: str, split: str, gold: dict, out_csv: str) -> int:
    """Gold labels for a split, in split order, in the reference
    label_set0.csv layout (scored positionally against meta.csv rows)."""
    from dicttts_tpu.text.pinyin import pinyin_to_tone3
    from dicttts_tpu.utils.indexed_dataset import IndexedDataset

    ds = IndexedDataset(os.path.join(bdir, split))
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


def make_train_probe(bdir: str, n: int = 50) -> str:
    """Copy the first n TRAIN items into a 'trainprobe' split so the CLI
    infer path can score held-IN sentences (optimization vs generalization
    split of the heteronym error)."""
    from dicttts_tpu.utils.indexed_dataset import IndexedDataset, IndexedDatasetBuilder

    ds = IndexedDataset(os.path.join(bdir, "train"))
    n = min(n, len(ds))
    if not os.path.exists(os.path.join(bdir, "trainprobe.idx")):
        b = IndexedDatasetBuilder(os.path.join(bdir, "trainprobe"))
        lengths = []
        for i in range(n):
            item = ds[i]
            b.add_item(item)
            lengths.append(item["len"])
        b.finalize()
        np.save(os.path.join(bdir, "trainprobe_lengths.npy"), np.asarray(lengths))
        src = os.path.join(bdir, "train_f0s_mean_std.npy")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(bdir, "trainprobe_f0s_mean_std.npy"))
    return "trainprobe"


# -- train + infer + score -----------------------------------------------------

def write_config(bdir: str, dict_path: str, max_updates: int,
                 extra: str = "") -> str:
    cfg = f"""\
base_config:
  - {REPO}/dicttts_tpu/configs/tts/dict_tts.yaml

binary_data_dir: {bdir}
dict_path: {dict_path}
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
{extra}
"""
    fn = os.path.join(ROOT, "per.yaml")
    with open(fn, "w") as f:
        f.write(cfg)
    return fn


def slot_diagnostics(labels_csv: str, meta_csv: str, dict_path: str,
                     out_json: str | None = None) -> dict:
    """Where do the errors live? Splits PER into single-pronunciation
    syllables (mechanics: should be ~0) vs heteronym slots (the actual
    disambiguation task), separates sandhi-FORCED slots (the straight-through
    rule override decides those, not attention) from FREE slots, reports the
    collapse-to-prior stat, and dumps every slot for error anatomy."""
    import csv

    from dicttts_tpu.eval.per import load_label_set, load_meta_predictions
    from dicttts_tpu.text.pinyin import load_dict, pinyin_to_tone3
    from dicttts_tpu.text.sandhi import SandhiProcessor

    labels = load_label_set(labels_csv)
    preds = load_meta_predictions(meta_csv)
    zd = load_dict(dict_path)
    sandhi = SandhiProcessor(zd)
    tone3 = {}  # tone-marked pinyin -> merged tone3 syllable ("kǎ" -> "ka3")

    def t3(syl: str) -> str:
        if syl not in tone3:
            ini, fin = pinyin_to_tone3(syl)
            tone3[syl] = ini + fin
        return tone3[syl]

    rows = list(csv.DictReader(open(labels_csv, encoding="utf-8")))
    single_tot = single_err = het_tot = het_err = pred_first = 0
    forced_tot = forced_err = free_tot = free_err = 0
    slots, skipped = [], 0
    for row, lab, pred in zip(rows, labels, preds):
        txt = row["txt"]
        if len(lab) != len(pred) or len(lab) != len(txt):
            skipped += 1
            continue  # alignment slips are counted by the headline PER only
        mods = sandhi.process_sandhi(txt)
        for j, (ch, g, p) in enumerate(zip(txt, lab, pred)):
            prons = zd.prons(ch) if ch in zd.entries else []
            if len(prons) >= 2:
                het_tot += 1
                het_err += int(g != p)
                pred_first += int(p == t3(prons[0]))
                forced = j < len(mods) and 0 < mods[j] <= len(prons)
                if forced:
                    forced_tot += 1
                    forced_err += int(g != p)
                else:
                    free_tot += 1
                    free_err += int(g != p)
                slots.append({
                    "item": row["item_name"], "pos": j, "char": ch,
                    "gold": g, "pred": p, "forced": bool(forced),
                    "gold_is_first": g == t3(prons[0]),
                    "n_readings": len(prons),
                })
            else:
                single_tot += 1
                single_err += int(g != p)
    # per-char aggregates over the erroneous slots
    per_char: dict[str, list[int]] = {}
    for s in slots:
        a = per_char.setdefault(s["char"], [0, 0])
        a[0] += int(s["gold"] != s["pred"])
        a[1] += 1
    worst = sorted(per_char.items(), key=lambda kv: -kv[1][0])
    if out_json:
        with open(out_json, "w", encoding="utf-8") as f:
            json.dump({"slots": slots,
                       "per_char_err": {c: {"err": e, "tot": t}
                                        for c, (e, t) in worst}},
                      f, ensure_ascii=False, indent=0)
    return {
        "single_pron_syllables": single_tot,
        "single_pron_errors": single_err,
        "heteronym_slots": het_tot,
        "heteronym_errors": het_err,
        "heteronym_acc_pct": round(100 * (1 - het_err / max(het_tot, 1)), 2),
        "free_slots": free_tot,
        "free_errors": free_err,
        "free_acc_pct": round(100 * (1 - free_err / max(free_tot, 1)), 2),
        "sandhi_forced_slots": forced_tot,
        "sandhi_forced_errors": forced_err,
        "model_predicts_first_reading_pct": round(100 * pred_first / max(het_tot, 1), 2),
        "rows_skipped_len_mismatch": skipped,
        "worst_chars": [
            {"char": c, "err": e, "tot": t} for c, (e, t) in worst[:10] if e > 0
        ],
    }


def run_cli(cfg_fn: str, exp_name: str, log_fn: str, infer: bool = False,
            hparams: str = "") -> None:
    # PREPEND to PYTHONPATH: this image registers the TPU backend through a
    # sitecustomize on the existing path — clobbering it silently drops the
    # chip and the subprocess dies at jax.devices()
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    cmd = [sys.executable, "-m", "dicttts_tpu.run", "--config", cfg_fn,
           "--exp_name", exp_name]
    if infer:
        cmd.append("--infer")
    if hparams:
        cmd += ["--hparams", hparams]
    with open(log_fn, "w") as logf:
        rc = subprocess.call(cmd, cwd=REPO, env=env,
                             stdout=logf, stderr=subprocess.STDOUT)
    assert rc == 0, f"{' '.join(cmd[3:])} rc={rc}; see {log_fn}"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max_updates", type=int, default=100000)
    ap.add_argument("--n_items", type=int, default=6000,
                    help="TRAIN+VALID sentence count (test is the fixed "
                         "committed 50; r4 used 2000)")
    ap.add_argument("--dict", dest="dict_path", default=DEFAULT_DICT,
                    help="path to zh-dict.json (the reference data asset; "
                         "required — not shipped in-tree)")
    ap.add_argument("--tag", default="r05", help="artifact tag: PER_<tag>.json")
    ap.add_argument("--hparams", default="", help="extra config overrides "
                    "passed to the train/infer CLI (comma list)")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing trained exp; just infer + score")
    ap.add_argument("--skip_infer", action="store_true",
                    help="reuse an existing meta.csv; just score")
    ap.add_argument("--score_train", action="store_true",
                    help="also infer+score 50 held-IN train sentences "
                         "(optimization vs generalization split)")
    args = ap.parse_args()
    assert os.path.exists(args.dict_path), (
        f"zh-dict not found at {args.dict_path}; pass --dict "
        "(the dictionary is a reference data asset, not shipped in-tree)")
    exp_name = f"per_eval_{args.tag}"

    t0 = time.time()
    print("| per: building heteronym corpus from the real zh-dict...", flush=True)
    bdir, gold, baseline, stats = build_per_corpus(ROOT, args.n_items, args.dict_path)
    labels_csv = os.path.join(ROOT, "labels.csv")
    n_test = write_labels(bdir, "test", gold, labels_csv)

    # exact context-free baseline PER over the same test rows: first
    # dictionary reading everywhere + the rule-based sandhi overrides — what
    # any g2p without semantic disambiguation would score here
    from dicttts_tpu.eval.per import pron_error_rate_files, wer
    from dicttts_tpu.utils.indexed_dataset import IndexedDataset

    test_ds = IndexedDataset(os.path.join(bdir, "test"))
    test_names = [test_ds[i]["item_name"] for i in range(len(test_ds))]
    baseline_per = wer([gold[n] for n in test_names], [baseline[n] for n in test_names])
    print(f"| per: corpus ready ({stats}); {n_test} test items; "
          f"first-pron baseline PER {100 * baseline_per:.2f}%", flush=True)
    cfg_fn = write_config(bdir, args.dict_path, args.max_updates)

    work_dir = os.path.join(REPO, "checkpoints", exp_name)
    if args.fresh:
        shutil.rmtree(work_dir, ignore_errors=True)

    if not args.skip_train:
        print("| per: training via the CLI...", flush=True)
        t1 = time.time()
        run_cli(cfg_fn, exp_name, os.path.join(ROOT, "train.log"),
                hparams=args.hparams)
        train_secs = time.time() - t1
    else:
        train_secs = None

    if not args.skip_infer:
        print("| per: inference via the CLI...", flush=True)
        t2 = time.time()
        run_cli(cfg_fn, exp_name, os.path.join(ROOT, "infer.log"), infer=True,
                hparams=args.hparams)
        infer_secs = time.time() - t2
    else:
        infer_secs = None

    gen_dir = os.path.join(work_dir, "generated")
    meta_csv = os.path.join(ROOT, "meta_test.csv")
    shutil.copy(os.path.join(gen_dir, "meta.csv"), meta_csv)
    per = pron_error_rate_files(meta_csv, labels_csv)
    breakdown = slot_diagnostics(labels_csv, meta_csv, args.dict_path,
                                 os.path.join(ROOT, "slot_diag.json"))

    train_probe = None
    if args.score_train:
      try:
        print("| per: scoring 50 held-IN train sentences...", flush=True)
        probe = make_train_probe(bdir, 50)
        probe_labels = os.path.join(ROOT, "labels_trainprobe.csv")
        write_labels(bdir, probe, gold, probe_labels)
        run_cli(cfg_fn, exp_name, os.path.join(ROOT, "infer_train.log"),
                infer=True,
                hparams=(args.hparams + "," if args.hparams else "")
                + f"test_set_name={probe}")
        probe_meta = os.path.join(ROOT, "meta_trainprobe.csv")
        shutil.copy(os.path.join(gen_dir, "meta.csv"), probe_meta)
        train_probe = {
            "per_pct": round(100 * pron_error_rate_files(probe_meta, probe_labels), 3),
            **{k: v for k, v in slot_diagnostics(
                probe_labels, probe_meta, args.dict_path,
                os.path.join(ROOT, "slot_diag_train.json")).items()
               if k != "worst_chars"},
        }
      except Exception as e:  # diagnostic extra — never lose the headline artifact
        train_probe = {"error": repr(e)}

    result = {
        "per_pct": round(100 * per, 3),
        "reference_anchor_per_pct": 1.93,
        "n_test_items": n_test,
        "max_updates": args.max_updates,
        "hparams": args.hparams or "(recipe defaults)",
        "bank_version": BANK_VERSION,
        "train_secs": round(train_secs, 1) if train_secs else None,
        "infer_secs": round(infer_secs, 1) if infer_secs else None,
        "breakdown": breakdown,
        "train_probe": train_probe,
        "provenance": {
            "corpus": "synthetic sentences over the REAL zh-dict "
                      f"({args.dict_path}, {7030} entries)",
            "task": "heteronym disambiguation from gloss-derived semantic "
                    "context; readings drawn uniformly per slot",
            "audio": "pronunciation-faithful 3-partial signatures (bank v2: "
                     "each syllable a distinct 3-subset of a 24-point "
                     "mel-equidistant grid, so any two syllables differ by "
                     ">=1 mel-resolvable partial; v1's enumeration gave "
                     "same-char tone pairs spectra 11 Hz apart — "
                     "unlearnable from 80-bin mels)",
            "gloss_features": "deterministic crc32-seeded gaussian fallback "
                              "(no RoFormer weights in this sandbox)",
            "sandhi": "text/sandhi.py overrides applied to audio AND labels",
            "test_set": "FIXED 50 sentences, committed at "
                        "data/per_test_set.json (own RNG stream, seed 12345)",
            "not_claimed": "Biaobei acoustics / MOS / the literal 1.93% "
                           "anchor — environment-blocked (no corpus, no "
                           "egress); this measures the S2PA pronunciation "
                           "machinery end-to-end on held-out sentences",
            **stats,
            "first_pron_baseline_per_pct": round(100 * baseline_per, 3),
        },
        "total_secs": round(time.time() - t0, 1),
    }
    with open(os.path.join(REPO, f"PER_{args.tag}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
