"""Two-process DCN rehearsal (VERDICT r3 next-round #6).

Launches TWO real OS processes that join one jax.distributed cluster (the
CPU analog of two TPU hosts over DCN), each with 4 virtual CPU devices, and
drives the ACTUAL CLI (`python -m dicttts_tpu.run --multihost`) on a tiny
synthetic corpus for a few sharded train steps. Verifies:

  * both processes see 8 global devices and finish rc=0;
  * gradient all-reduce spans the processes (the train step runs on a
    global 8-device mesh, batch sharded 4+4);
  * chief-only side effects: ONLY process 0 writes checkpoints/TB;
  * the seeded host pipeline feeds identical global batches on both
    processes (device_put with a cross-process NamedSharding requires it —
    each process materializes only its addressable shards).

Writes MULTIHOST_r04.json at the repo root. Usage:

    python scripts/dcn_rehearsal.py [--steps 6]

Reference parity: single-node mp.spawn + NCCL process group
(/root/reference/utils/trainer.py:454-479) — rebuilt as one process per
host + jax.distributed + XLA collectives (SURVEY.md §2.3).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EXP_NAME = "dcn_rehearsal_r04"


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def write_config(root: str, bdir: str, steps: int) -> str:
    cfg = f"""\
base_config:
  - {REPO}/dicttts_tpu/configs/tts/dict_tts.yaml

binary_data_dir: {bdir}
dict_path: {os.path.join(root, 'zh-dict.json')}
lm_model: ''
use_pitch_embed: false

hidden_size: 32
dict_embed_dim: 768
latent_size: 4
fvae_enc_dec_hidden: 32
fvae_enc_n_layers: 2
fvae_dec_n_layers: 2
prior_glow_hidden: 8
prior_glow_n_blocks: 1
mel_disc_hidden_size: 16
enc_layers: 1
word_enc_layers: 1

max_frames: 128
max_sentences: 8       # 8 sentences shard 1-per-device over the 8 global devices
max_tokens: 4000
mel_buckets: [128]
txt_buckets: [16]
gloss_buckets: [48]
pinyin_buckets: [8]
sentence_buckets: [8]
frames_multiple: 4

max_updates: {steps}
val_check_interval: {steps}
valid_infer_interval: 1000000000
num_sanity_val_steps: 1
eval_max_batches: 1
tb_log_interval: 2
steps_per_dispatch: 2
disc_start_steps: 2
"""
    fn = os.path.join(root, "dcn.yaml")
    with open(fn, "w") as f:
        f.write(cfg)
    return fn


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--n_items", type=int, default=16)
    args = ap.parse_args()

    from synth_corpus import build_corpus

    root = os.path.join(REPO, ".dcn_corpus")
    print("| dcn: building tiny corpus...", flush=True)
    bdir = build_corpus(root, n_words=48, n_items=args.n_items,
                        min_chars=6, max_chars=10)
    cfg_fn = write_config(root, bdir, args.steps)

    work_dir = os.path.join(REPO, "checkpoints", EXP_NAME)
    shutil.rmtree(work_dir, ignore_errors=True)

    port = free_port()
    procs, logs = [], []
    t0 = time.time()
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            DICTTTS_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            DICTTTS_COORDINATOR=f"127.0.0.1:{port}",
            DICTTTS_NUM_PROCESSES="2",
            DICTTTS_PROCESS_ID=str(pid),
        )
        log_fn = os.path.join(root, f"proc{pid}.log")
        logs.append(log_fn)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "dicttts_tpu.run", "--config", cfg_fn,
                 "--exp_name", EXP_NAME, "--multihost"],
                cwd=REPO, env=env,
                stdout=open(log_fn, "w"), stderr=subprocess.STDOUT,
            )
        )
    rcs = [p.wait(timeout=1200) for p in procs]
    wall = time.time() - t0
    texts = [open(fn).read() for fn in logs]

    assert rcs == [0, 0], f"rcs={rcs}; see {logs}"
    for pid, text in enumerate(texts):
        assert f"multihost: process {pid}/2, 4 local / 8 global devices" in text, (
            f"proc{pid} did not join the 2-process 8-device cluster; see {logs[pid]}"
        )
    # training stepped on both processes (SPMD: both log the same steps)
    assert f"step {args.steps} |" in texts[0] and f"step {args.steps} |" in texts[1]
    # chief-only side effects: process 0 wrote checkpoints + TB, process 1
    # wrote NOTHING (is_chief gating, reference rank-0 gating
    # utils/trainer.py:141-145,164-165)
    import glob

    ckpts = glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt"))
    assert ckpts, f"chief wrote no checkpoints in {work_dir}"
    assert "validation @" in texts[0]
    # the non-chief must not have built a TB writer; both evaluate, but only
    # the chief persists. (Checkpoint files carry no process id, so the
    # proof is the gating in Trainer._save + a single writer dir.)
    tb_dirs = glob.glob(os.path.join(work_dir, "tb*"))
    assert len(tb_dirs) <= 1, tb_dirs

    # losses identical across processes at the last logged step: gradients
    # were all-reduced over DCN, so both replicas hold the same state
    def last_step_line(text):
        return [l for l in text.splitlines() if f"step {args.steps} |" in l][-1]

    def loss_metrics(line):
        # drop steps_per_sec: host wall-clock, legitimately differs per process
        return " ".join(
            kv for kv in line.split("|")[1].strip().split()
            if not kv.startswith("steps_per_sec")
        )

    m0 = loss_metrics(last_step_line(texts[0]))
    m1 = loss_metrics(last_step_line(texts[1]))
    assert m0 == m1, f"replica divergence:\n  p0: {m0}\n  p1: {m1}"

    result = {
        "processes": 2,
        "local_devices_each": 4,
        "global_devices": 8,
        "steps": args.steps,
        "batch_sentences": 8,
        "rcs": rcs,
        "wall_secs": round(wall, 1),
        "chief_ckpts": sorted(os.path.basename(c) for c in ckpts),
        "replica_metrics_match": True,
        "last_step_metrics": m0,
    }
    with open(os.path.join(REPO, "MULTIHOST_r04.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print("| dcn rehearsal: OK")


if __name__ == "__main__":
    main()
