"""Perf probe: trainer steady-state breakdown at the production geometry.

Runs bench._bench_trainer with GRAFT_TRACE_GROUPS=1 so the Trainer prints
where each dispatched group's host wall goes (batch wait / pad+stack /
device_put / dispatch issuance). Use on an otherwise-idle machine
(CLAUDE.md: concurrent CPU load skews the numbers).

    python scripts/probe_trainer.py [--stream] [--k 8] [--steps 160]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("GRAFT_TRACE_GROUPS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", action="store_true", help="A/B: stream mels instead of frame cache")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=160)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _bench_trainer, _ensure_prod_corpus

    bdir = _ensure_prod_corpus()
    out = _bench_trainer(bdir, frame_cache=not args.stream, k_dispatch=args.k, max_updates=args.steps)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
