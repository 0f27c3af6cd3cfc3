"""Sweep Trainer.steps_per_dispatch at the production geometry (60x512,
8000-word device bank, device frame cache) on the real chip.

Context: with HOST-STREAMED mel batches, k=16 OOMed the relay's compile
helper (the scanned xs stack held 16x60x512x80 mel frames — ~79 MB of f16
per dispatch plus its gradient-graph working set; scripts/soak.py:67).
The device frame cache changed the dispatch payload shape entirely: the
scan now carries int32 item_idx / token ids only (~0.3 MB/step), so larger
k may fit and would amortize the ~35 ms relay issuance per scanned group
over more optimizer steps.

Usage: python scripts/dispatch_sweep.py [k ...]   (default: 8 16)
Prints one JSON line per k; a relay/compile failure for a given k is
caught and reported as {"k": k, "error": ...} so the sweep continues.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    ks = [int(a) for a in sys.argv[1:]] or [8, 16]
    bdir = bench._ensure_prod_corpus()
    for k in ks:
        # enough updates for >= 3 steady-state dispatch groups after the
        # compile-absorbing first group
        n_updates = max(160, k * 6)
        try:
            out = bench._bench_trainer(bdir, frame_cache=True, k_dispatch=k,
                                       max_updates=n_updates)
            print(json.dumps({"k": k, "updates": n_updates,
                              "step_ms": out["train_step_ms_real_data"],
                              "steps_per_sec": out["train_steps_per_sec_real_data"],
                              "mfu_pct": out["train_mfu_pct"]}), flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive an OOM at one k
            print(json.dumps({"k": k, "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
