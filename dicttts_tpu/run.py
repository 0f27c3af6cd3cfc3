"""CLI entry: train or infer a task from a config.

Capability parity with /root/reference/tasks/run.py:6-42 +
tasks/base_task.py:317-352: resolve the config chain, import the task class
named by cfg['task_cls'], build the trainer from config and dispatch train
vs --infer. Usage:

    python -m dicttts_tpu.run --config dicttts_tpu/configs/datasets/biaobei/dict_tts.yaml \
        --exp_name dicttts_biaobei [--infer] [--hparams="a=1,b.c=2"] [--reset]
"""

from __future__ import annotations

import argparse
import importlib
import logging
import os


def autoconfigure_vocabs(cfg: dict) -> dict:
    """Derive model vocab sizes from the binarized corpus artifacts
    (reference builds encoders from binary-dir jsons, tts_base.py:158-166):
    n_vocab from phone_set.json, word_size from word_set.json,
    value_embedding_size from pinyin_encoder.pkl."""
    import json
    import pickle

    data_dir = cfg.get("binary_data_dir", "")
    ps = os.path.join(data_dir, "phone_set.json")
    if os.path.exists(ps):
        cfg.setdefault("n_vocab", len(json.load(open(ps))) + 3)  # + reserved ids
    ws = os.path.join(data_dir, "word_set.json")
    if os.path.exists(ws):
        cfg["word_size"] = len(json.load(open(ws))) + 3
    pe = os.path.join(data_dir, "pinyin_encoder.pkl")
    if os.path.exists(pe):
        with open(pe, "rb") as f:
            cfg["value_embedding_size"] = len(pickle.load(f)) + 2
    return cfg


def build_data_provider(cfg: dict, task_cls_name: str, mesh_size: int):
    from dicttts_tpu.data.datasets import TTSBatchProvider, TTSBinaryDataset, VocoderDataset

    data_dir = cfg.get("binary_data_dir", "")
    if not data_dir or not os.path.exists(os.path.join(data_dir, "train.idx")):
        raise FileNotFoundError(
            f"binary_data_dir {data_dir!r} has no binaries; run the binarizer first "
            "(python -m dicttts_tpu.text.binarize --config ...)"
        )
    if "hifigan" in task_cls_name.lower():
        return VocoderDataset(data_dir, cfg.get("train_set_name", "train"), cfg,
                              batch_size=cfg.get("max_sentences", 24))
    kind = "dict" if cfg.get("use_dict") else ("word" if cfg.get("dur_level") == "word" else "fs")

    class _Splits:
        def __init__(self):
            self.train = TTSBatchProvider(
                TTSBinaryDataset(data_dir, cfg.get("train_set_name", "train"), cfg, kind),
                cfg, shuffle=True, devices_multiple=mesh_size,
                # device-resident frame cache: train batches carry item_idx
                # only; the task gathers mels/f0/uv from HBM by item id
                emit_frame_refs=bool(cfg.get("use_device_frame_cache")),
            )
            self.valid = TTSBatchProvider(
                TTSBinaryDataset(data_dir, cfg.get("valid_set_name", "valid"), cfg, kind),
                cfg, shuffle=False, devices_multiple=mesh_size,
            )
            test_cfg = dict(cfg, max_sentences=1)
            self.test = TTSBatchProvider(
                TTSBinaryDataset(data_dir, cfg.get("test_set_name", "test"), cfg, kind),
                test_cfg, shuffle=False, devices_multiple=1,
            )
            # tasks resolve the device-resident dict bank through
            # provider.ds (use_device_dict_bank); expose the train split's
            self.ds = self.train.ds

        def train_batches(self):
            return self.train.train_batches()

        def val_batches(self):
            return self.valid.val_batches()

        def test_batches(self):
            return self.test.test_batches()

    return _Splits()


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description="dicttts_tpu runner")
    parser.add_argument("--config", type=str, default="")
    parser.add_argument("--exp_name", type=str, default="")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--infer", action="store_true")
    parser.add_argument("--reset", action="store_true")
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed for multi-host DP over DCN "
        "(coordinator/process env vars per the standard JAX cluster setup)",
    )
    args = parser.parse_args(argv)

    # ops escape hatch: SIGUSR1 dumps all python stacks (diagnosing hung
    # multihost processes without a debugger attached)
    if os.environ.get("DICTTTS_FAULTHANDLER"):
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1, all_threads=True)

    # explicit platform override (this image's sitecustomize force-registers
    # the axon TPU backend regardless of JAX_PLATFORMS; tests/smokes that
    # must stay off the chip set DICTTTS_PLATFORM=cpu)
    plat = os.environ.get("DICTTTS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    # hardware PRNG for training-time randomness (dropout masks, disc crop
    # draws): threefry2x32 is a long VPU ALU chain — measured 1.16 ms/step
    # JUST for the discriminator's dropout masks at the production geometry
    # vs 0.47 ms with the TPU RngBitGenerator ('rbg' draws; key split/fold_in
    # stay threefry so stream derivation is still well-mixed). Opt out with
    # rng_impl: threefry2x32 in the config for bit-reproducible runs across
    # backends.
    if os.environ.get("DICTTTS_RNG_IMPL", "rbg") != "threefry2x32":
        import jax

        jax.config.update(
            "jax_default_prng_impl", os.environ.get("DICTTTS_RNG_IMPL", "rbg")
        )

    if args.multihost:
        import jax

        # one process per host joins the global mesh; batches shard over all
        # global devices and gradient all-reduce rides ICI within a slice,
        # DCN across slices (SURVEY.md §2.3 rebuild plan). On TPU pods the
        # cluster auto-detects; elsewhere (manual clusters, the CPU DCN
        # rehearsal scripts/dcn_rehearsal.py) the spec comes from env vars —
        # the moral analog of the reference's MASTER_ADDR/MASTER_PORT
        # (utils/trainer.py:475-479).
        kw = {}
        if os.environ.get("DICTTTS_COORDINATOR"):
            kw = dict(
                coordinator_address=os.environ["DICTTTS_COORDINATOR"],
                num_processes=int(os.environ["DICTTTS_NUM_PROCESSES"]),
                process_id=int(os.environ["DICTTTS_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)
        logging.info(
            "multihost: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )

    from dicttts_tpu.config import load_config
    from dicttts_tpu.parallel.mesh import make_mesh
    from dicttts_tpu.train.trainer import Trainer

    cfg = load_config(
        config=args.config, exp_name=args.exp_name, overrides=args.hparams,
        reset=args.reset, infer=args.infer,
    )
    task_path = cfg["task_cls"]
    mod, cls_name = task_path.rsplit(".", 1)
    task_cls = getattr(importlib.import_module(mod), cls_name)

    mesh = make_mesh()
    autoconfigure_vocabs(cfg)
    data = build_data_provider(cfg, task_path, mesh.size)
    task = task_cls(cfg, data)
    trainer = Trainer(
        work_dir=cfg.get("work_dir", ""),
        max_updates=cfg.get("max_updates", 160000),
        val_check_interval=cfg.get("val_check_interval", 2000),
        num_sanity_val_steps=cfg.get("num_sanity_val_steps", 5),
        num_ckpt_keep=cfg.get("num_ckpt_keep", 3),
        tb_log_interval=cfg.get("tb_log_interval", 100),
        eval_max_batches=cfg.get("eval_max_batches", -1),
        monitor_key=cfg.get("valid_monitor_key", "total_loss"),
        monitor_mode=cfg.get("valid_monitor_mode", "min"),
        seed=cfg.get("seed", 1234),
        mesh=mesh,
        save_best=cfg.get("save_best", True),
        steps_per_dispatch=cfg.get("steps_per_dispatch", 1),
        valid_infer_interval=cfg.get("valid_infer_interval"),
    )
    if args.infer:
        outputs = trainer.test(task)
        logging.info("inference done: %d batches", len(outputs))
    else:
        trainer.fit(task)


if __name__ == "__main__":
    main()
