"""PER scoring CLI (reference /root/reference/scripts/get_pron_error.py).

    python scripts/get_pron_error.py --pred <infer_out>/meta.csv --labels <label_set.csv>

pred CSV rows: item_name, text, space-separated predicted pinyin.
label CSV rows: item_name, text, space-separated reference pinyin.
Prints corpus PER and per-item errors.
"""

import argparse
import sys

sys.path.insert(0, ".")

from dicttts_tpu.eval.per import edit_distance, load_labels, pron_error_rate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--show_errors", action="store_true")
    args = p.parse_args()
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
    print(f"| PER: {per * 100:.2f}%")


if __name__ == "__main__":
    main()
