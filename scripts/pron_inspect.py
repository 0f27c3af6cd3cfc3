"""Pronunciation-error inspection across experiment runs.

Equivalent of the reference's ``utils/pron_utils.py`` (:20-80) +
``scripts/pron_utils`` usage pattern: compare one or more test-run output
dirs (each holding a ``meta.csv`` written by ``--infer``) against a label
file, printing every mismatched utterance (predicted vs gold syllables)
plus per-experiment totals and heteronym density.

Label formats (auto-detected):
  - ``label_set0.csv`` — the reference's CSV schema (header; col 4 ph
    string), shared with scripts/get_pron_error.py.
  - TSV — ``wav_id\\t<char py char py ...>`` alternating char/pinyin
    (pron_utils.get_label, :20-33); odd-index tokens are syllables, tone-5
    marks are stripped.

Heteronym density: the reference counts chars with >1 pypinyin reading
(pron_utils.py:58-64). pypinyin is absent in this image, so heteronyms are
counted from the same zh-dict.json the model itself uses (>1 pronunciation
entry) — same notion, dictionary-backed.

Usage:
    python scripts/pron_inspect.py --labels scripts/pron_label/label_set0.csv \
        checkpoints/exp_a/generated_30000_ checkpoints/exp_b/generated_18000_
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dicttts_tpu.eval.per import edit_distance, load_label_set


def _strip_tone5(syl: str) -> str:
    return syl[:-1] if syl.endswith("5") else syl


def load_tsv_labels(path: str) -> tuple[list[list[str]], list[str]]:
    """pron_utils.get_label format -> (gold syllable lists, wav_ids)."""
    gold, ids = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            wav_id, content = line.split("\t")[0], line.split("\t")[1].split(" ")
            # odd indices are the pinyin syllables (reference :27-31)
            gold.append([_strip_tone5(content[i]) for i in range(len(content)) if i % 2 == 1])
            ids.append(wav_id)
    return gold, ids


def load_any_labels(path: str) -> tuple[list[list[str]], list[str]]:
    with open(path, encoding="utf-8") as f:
        head = f.readline()
    if "\t" in head:
        return load_tsv_labels(path)
    gold = load_label_set(path)
    return gold, [str(i) for i in range(len(gold))]


def load_meta_rows(meta_csv: str) -> list[dict]:
    """meta.csv -> [{name, text, syllables}] (same parsing as eval/per.py
    but keeping the text column for heteronym counting)."""
    from dicttts_tpu.eval.per import merge_token_pairs

    rows = []
    with open(meta_csv, encoding="utf-8") as f:
        lines = f.readlines()
    for line in lines[1:]:
        parts = next(csv.reader([line]))
        if len(parts) < 4:
            continue
        toks = parts[3].replace("<UNK> ", "").strip().split(" ")
        rows.append({"name": parts[1], "text": parts[2], "syllables": merge_token_pairs(toks)})
    return rows


def heteronym_count(text: str, zh_dict) -> int:
    """Chars with more than one dictionary reading (pron_utils.py:58-64,
    dict-backed instead of pypinyin)."""
    if zh_dict is None:
        return 0
    return sum(1 for ch in text if len(zh_dict.prons(ch)) > 1)


def inspect_run(run: str, gold: list[list[str]], ids: list[str], zh_dict, show_all: bool) -> dict:
    meta = run if run.endswith(".csv") else os.path.join(run, "meta.csv")
    rows = load_meta_rows(meta)
    n = min(len(rows), len(gold))
    total_err = total_syl = total_het = n_bad = 0
    for i in range(n):
        pred, ref = rows[i]["syllables"], gold[i]
        d = edit_distance(ref, pred)
        het = heteronym_count(rows[i]["text"], zh_dict)
        total_err += d
        total_syl += len(ref)
        total_het += het
        if d:
            n_bad += 1
            print(f"[{run}] {ids[i] if i < len(ids) else i} ({rows[i]['name']}): "
                  f"{d} errors, {het} heteronyms")
            print(f"  ref: {' '.join(ref)}")
            print(f"  hyp: {' '.join(pred)}")
        elif show_all:
            print(f"[{run}] {ids[i] if i < len(ids) else i}: ok ({het} heteronyms)")
    per = total_err / max(total_syl, 1)
    return {
        "run": run, "items": n, "items_with_errors": n_bad,
        "syllable_errors": total_err, "syllables": total_syl,
        "heteronyms": total_het,
        "per_pct": round(100.0 * per, 3),
        "err_per_heteronym": round(total_err / max(total_het, 1), 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+", help="test-output dirs (or meta.csv paths) to compare")
    p.add_argument("--labels", required=True, help="label_set0.csv or wav_id-TSV label file")
    p.add_argument("--dict_path", default="data/zh-dict.json", help="for heteronym counting")
    p.add_argument("--show_all", action="store_true")
    args = p.parse_args()

    zh_dict = None
    if os.path.exists(args.dict_path):
        from dicttts_tpu.text.pinyin import load_dict

        zh_dict = load_dict(args.dict_path)

    gold, ids = load_any_labels(args.labels)
    summaries = [inspect_run(r, gold, ids, zh_dict, args.show_all) for r in args.runs]
    print("\n| run | items | err items | PER% | heteronyms | err/het |")
    for s in summaries:
        print(f"| {s['run']} | {s['items']} | {s['items_with_errors']} | "
              f"{s['per_pct']} | {s['heteronyms']} | {s['err_per_heteronym']} |")


if __name__ == "__main__":
    main()
