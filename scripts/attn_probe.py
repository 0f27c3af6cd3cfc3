"""Per-slot S2PA attention anatomy for a trained per_eval experiment.

Answers the VERDICT r4 #1 diagnosis question: at heteronym slots, is the
attention DIFFUSE (sense masses near uniform — weak learning signal) or
SHARP-BUT-WRONG (confidently mistaken — conflicting memorization)? Runs the
trained checkpoint on CPU over test items and prints margin/entropy stats
split by correctness.

Usage: python scripts/attn_probe.py [--exp per_eval_r05] [--n 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("DICTTTS_PLATFORM", "cpu")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exp", default="per_eval_r05")
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--split", default="test")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from dicttts_tpu.config import load_config
    from dicttts_tpu.run import autoconfigure_vocabs, build_data_provider
    from dicttts_tpu.text.pinyin import load_dict, pinyin_to_tone3
    from dicttts_tpu.utils.checkpoint import get_last_checkpoint, restore_checkpoint

    work_dir = os.path.join(REPO, "checkpoints", args.exp)
    cfg = dict(load_config(config=os.path.join(work_dir, "config.yaml"), save=False))
    cfg["work_dir"] = work_dir
    cfg["use_device_frame_cache"] = False  # host probe: no cache needed
    cfg["test_set_name"] = args.split
    autoconfigure_vocabs(cfg)
    task_cls_name = cfg["task_cls"]
    data = build_data_provider(cfg, task_cls_name, mesh_size=1)

    import importlib

    mod, cls_name = task_cls_name.rsplit(".", 1)
    task = getattr(importlib.import_module(mod), cls_name)(cfg, data)
    state = task.build_state(jax.random.PRNGKey(0))
    step, restored = restore_checkpoint(get_last_checkpoint(work_dir),
                                        {k: v for k, v in state.items()
                                         if not k.startswith("_const_")})
    state.update(restored)
    print(f"| probe: checkpoint step {step}", flush=True)

    zd = load_dict(cfg["dict_path"])

    # gold syllables by item name (the per_eval label files)
    import csv

    from dicttts_tpu.eval.per import parse_label_ph

    label_fn = os.path.join(
        REPO, ".per_corpus",
        "labels.csv" if args.split == "test" else f"labels_{args.split}.csv")
    gold_by_name = {}
    if os.path.exists(label_fn):
        for row in csv.DictReader(open(label_fn, encoding="utf-8")):
            gold_by_name[row["item_name"]] = parse_label_ph(row["ph"])

    from dicttts_tpu.train.tasks.dict_tts import _dict_msg

    t3cache = {}

    def t3(s):
        if s not in t3cache:
            ini, fin = pinyin_to_tone3(s)
            t3cache[s] = ini + fin
        return t3cache[s]

    import jax.numpy as jnp

    test_fn = jax.jit(task.test_step)
    stats = {"correct": [], "wrong": []}
    rows = []
    n_done = 0
    for bi, batch in enumerate(data.test_batches()):
        if n_done >= args.n:
            break
        metas = batch.get("_meta", [{}])
        batch_nometa = {k: v for k, v in batch.items() if k != "_meta"}
        out = jax.device_get(test_fn(state, batch_nometa, jax.random.PRNGKey(1)))
        dm = _dict_msg(task.prepare_batch(state, batch_nometa), task.bank_fused)
        pm = np.asarray(dm.pinyin_map)  # [B, Tw, P]
        pron_attn = np.asarray(out["pron_attn"])  # [B, Tw, P]
        for b, meta in enumerate(metas):
            txt = meta.get("txt", "")
            syls = gold_by_name.get(meta.get("item_name", ""), [])
            for j, ch in enumerate(txt):
                prons = zd.prons(ch) if ch in zd.entries else []
                if len(prons) < 2:
                    continue
                w = pron_attn[b, j + 1]  # skip BOS row
                sense_ids = pm[b, j + 1]
                masses = []
                for s in range(1, int(sense_ids.max()) + 1):
                    sel = sense_ids == s
                    masses.append(float(w[sel].mean()) if sel.any() else 0.0)
                if not masses or sum(masses) <= 0:
                    continue
                p = np.asarray(masses) / sum(masses)
                pred_sense = int(np.argmax(p))
                srt = np.sort(p)[::-1]
                margin = float(srt[0] - (srt[1] if len(srt) > 1 else 0.0))
                ent = float(-(p * np.log(np.maximum(p, 1e-9))).sum() / np.log(max(len(p), 2)))
                # gold sense: match the gold syllable among prons
                gold_syl = syls[j] if j < len(syls) else None
                gold_sense = None
                for si, pr in enumerate(prons):
                    if t3(pr) == gold_syl:
                        gold_sense = si
                        break
                if gold_sense is None:
                    continue
                ok = pred_sense == gold_sense
                stats["correct" if ok else "wrong"].append((margin, ent, p.max()))
                rows.append({"char": ch, "gold": gold_sense, "pred": pred_sense,
                             "p": [round(float(x), 3) for x in p],
                             "margin": round(margin, 3)})
        n_done += 1

    for k, v in stats.items():
        if v:
            m = np.asarray(v)
            print(f"{k}: n={len(v)} margin mean={m[:,0].mean():.3f} "
                  f"median={np.median(m[:,0]):.3f} | norm-entropy mean={m[:,1].mean():.3f} "
                  f"| top-p mean={m[:,2].mean():.3f}", flush=True)
    diffuse = [r for r in rows if r["margin"] < 0.2]
    print(f"slots with margin<0.2 (diffuse): {len(diffuse)}/{len(rows)}")
    out_fn = os.path.join(REPO, ".per_corpus", f"attn_probe_{args.split}.json")
    with open(out_fn, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=False, indent=0)
    print("| wrote", out_fn)


if __name__ == "__main__":
    main()
