"""Pronunciation error rate (PER) scoring.

Capability parity with /root/reference/scripts/get_pron_error.py: compare
predicted per-word pinyin strings against human labels; PER = word error
rate of the pinyin sequences (jiwer.wer semantics, implemented here as
Levenshtein distance over token sequences / reference length). The label
CSV format matches the reference's scripts/pron_label/label_set0.csv:
rows of (item_name, text, space-separated per-char pinyin).
"""

from __future__ import annotations

import csv


def edit_distance(ref: list[str], hyp: list[str]) -> int:
    m, n = len(ref), len(hyp)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


def wer(refs: list[list[str]], hyps: list[list[str]]) -> float:
    """Corpus-level word error rate."""
    total_err = sum(edit_distance(r, h) for r, h in zip(refs, hyps))
    total_len = sum(len(r) for r in refs)
    return total_err / max(total_len, 1)


def load_labels(label_csv: str) -> dict[str, list[str]]:
    """item_name -> per-char pinyin tokens."""
    out = {}
    with open(label_csv, encoding="utf-8") as f:
        for row in csv.reader(f):
            if len(row) >= 3:
                out[row[0]] = row[2].strip().split()
    return out


def pron_error_rate(predictions: dict[str, list[str]], labels: dict[str, list[str]]) -> float:
    """predictions/labels: item_name -> pinyin token list. Items present in
    both are scored; PER = corpus WER."""
    refs, hyps = [], []
    for name, ref in labels.items():
        if name in predictions:
            refs.append(ref)
            hyps.append(predictions[name])
    assert refs, "no overlapping items between predictions and labels"
    return wer(refs, hyps)
