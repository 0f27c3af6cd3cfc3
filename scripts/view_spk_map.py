"""Print a binarized corpus's speaker map (reference scripts/view_spk_map.py)."""

import argparse
import json

p = argparse.ArgumentParser()
p.add_argument("--binary_data_dir", required=True)
args = p.parse_args()
spk_map = json.load(open(f"{args.binary_data_dir}/spk_map.json"))
for name, idx in sorted(spk_map.items(), key=lambda kv: kv[1]):
    print(f"{idx}\t{name}")
print(f"| {len(spk_map)} speakers")
