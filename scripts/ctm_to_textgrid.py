"""Convert Kaldi/MFA1 CTM alignment files into Praat TextGrids.

Capability parity with /root/reference/scripts/mfa_aligner_textgrid.py,
decoupled from MFA1's internal corpus/dictionary objects: takes plain CTM
lines (``utt channel begin duration label``) for words and/or phones and
writes one TextGrid per utterance, readable by dicttts_tpu.text.textgrid.

    python scripts/ctm_to_textgrid.py --word_ctm word.ctm \
        --phone_ctm phone.ctm --out mfa_outputs/
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")


def parse_ctm(path: str) -> dict:
    """CTM -> {utt: [(begin, end, label)]} sorted by begin."""
    utts = defaultdict(list)
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:
                continue
            utt, _, begin, dur, label = parts[:5]
            b = float(begin)
            utts[utt].append((b, b + float(dur), label))
    return {k: sorted(v) for k, v in utts.items()}


def _tier(name: str, intervals: list, xmax: float) -> str:
    """Render one IntervalTier, filling gaps with empty (silence) labels."""
    filled = []
    cursor = 0.0
    for b, e, label in intervals:
        if b > cursor + 1e-6:
            filled.append((cursor, b, ""))
        filled.append((b, e, label))
        cursor = e
    if cursor < xmax - 1e-6:
        filled.append((cursor, xmax, ""))
    out = [
        '        class = "IntervalTier"',
        f'        name = "{name}"',
        "        xmin = 0",
        f"        xmax = {xmax}",
        f"        intervals: size = {len(filled)}",
    ]
    for i, (b, e, label) in enumerate(filled, 1):
        out += [
            f"        intervals [{i}]:",
            f"            xmin = {b}",
            f"            xmax = {e}",
            f'            text = "{label}"',
        ]
    return "\n".join(out)


def write_textgrid(path: str, tiers: dict, xmax: float):
    body = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = 0",
        f"xmax = {xmax}",
        "tiers? <exists>",
        f"size = {len(tiers)}",
        "item []:",
    ]
    for i, (name, intervals) in enumerate(tiers.items(), 1):
        body.append(f"    item [{i}]:")
        body.append(_tier(name, intervals, xmax))
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(body) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--word_ctm")
    p.add_argument("--phone_ctm")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    assert args.word_ctm or args.phone_ctm, "need at least one CTM"
    words = parse_ctm(args.word_ctm) if args.word_ctm else {}
    phones = parse_ctm(args.phone_ctm) if args.phone_ctm else {}
    os.makedirs(args.out, exist_ok=True)
    for utt in sorted(set(words) | set(phones)):
        tiers = {}
        if utt in words:
            tiers["words"] = words[utt]
        if utt in phones:
            tiers["phones"] = phones[utt]
        xmax = max(e for ivs in tiers.values() for _, e, _ in ivs)
        write_textgrid(os.path.join(args.out, f"{utt}.TextGrid"), tiers, xmax)
    print(f"| wrote {len(set(words) | set(phones))} TextGrids -> {args.out}")


if __name__ == "__main__":
    main()
