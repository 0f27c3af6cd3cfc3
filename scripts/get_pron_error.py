"""PER scoring CLI (reference /root/reference/scripts/get_pron_error.py).

Reference mode (default) — score a test run's meta.csv against a
label_set0.csv-format label file (header; col 4 = `<BOS> k a3 | er3 ...
<EOS>` ph string); meta.csv col 3 holds the two-tokens-per-char decode:

    python scripts/get_pron_error.py --pred <infer_out>/meta.csv \
        --labels scripts/pron_label/label_set0.csv

Simple mode (--simple) — name-keyed 3-column CSVs on both sides.
"""

import argparse
import sys

sys.path.insert(0, ".")

from dicttts_tpu.eval.per import (
    edit_distance,
    load_label_set,
    load_labels,
    load_meta_predictions,
    pron_error_rate,
    pron_error_rate_files,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--simple", action="store_true", help="name-keyed 3-col CSVs")
    p.add_argument("--show_errors", action="store_true")
    args = p.parse_args()
    if args.simple:
        preds = load_labels(args.pred)
        labels = load_labels(args.labels)
        per = pron_error_rate(preds, labels)
        n_scored = len(set(preds) & set(labels))
        print(f"| scored {n_scored} items")
        if args.show_errors:
            for name in sorted(set(preds) & set(labels)):
                d = edit_distance(labels[name], preds[name])
                if d:
                    print(f"{name}: {d} errors\n  ref: {' '.join(labels[name])}\n  hyp: {' '.join(preds[name])}")
    else:
        pred = load_meta_predictions(args.pred)
        gold = load_label_set(args.labels)
        n = min(len(pred), len(gold))
        print(f"| scored {n} items (pred {len(pred)}, gold {len(gold)})")
        if args.show_errors:
            for i in range(n):
                d = edit_distance(pred[i], gold[i])
                if d:
                    print(f"row {i}: {d} errors\n  ref: {' '.join(gold[i])}\n  hyp: {' '.join(pred[i])}")
        per = pron_error_rate_files(args.pred, args.labels)
        print(f"| PER: {per * 100:.2f}%")
        return
    print(f"| PER: {per * 100:.2f}%")


if __name__ == "__main__":
    main()
