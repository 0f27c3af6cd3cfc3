"""f0 DTW prosody evaluation CLI (reference scripts/pitch_dtw.py):
mean DTW distance between generated and ground-truth f0 contours.

    python scripts/pitch_dtw.py --gen_dir <dir with <item>.f0.npy> --gt_dir <dir>
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from dicttts_tpu.eval.metrics import f0_dtw


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen_dir", required=True)
    p.add_argument("--gt_dir", required=True)
    args = p.parse_args()
    dists = []
    for gen_fn in sorted(glob.glob(os.path.join(args.gen_dir, "*.f0.npy"))):
        name = os.path.basename(gen_fn)
        gt_fn = os.path.join(args.gt_dir, name)
        if not os.path.exists(gt_fn):
            continue
        d = f0_dtw(np.load(gen_fn), np.load(gt_fn))
        if np.isfinite(d):
            dists.append(d)
            print(f"{name}: {d:.2f}")
    print(f"| mean f0 DTW over {len(dists)} items: {np.mean(dists):.3f}")


if __name__ == "__main__":
    main()
