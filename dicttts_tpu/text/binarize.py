"""CLI: run pre-align and/or binarize from a config (reference
data_gen/tts/bin/{pre_align,binarize}.py).

    python -m dicttts_tpu.text.binarize --config <cfg.yaml> [--stage all|pre_align|binarize]
"""

from __future__ import annotations

import argparse
import importlib
import logging


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--exp_name", default="")
    p.add_argument("--hparams", default="")
    p.add_argument("--stage", default="all", choices=["all", "pre_align", "binarize"])
    args = p.parse_args(argv)

    from dicttts_tpu.config import load_config

    # offline pipeline: fall back to CPU when the accelerator backend is
    # unavailable (e.g. JAX_PLATFORMS=axon set but plugin unregistered);
    # DICTTTS_PLATFORM forces a backend (the sitecustomize here pins axon
    # regardless of JAX_PLATFORMS)
    import os

    import jax

    if os.environ.get("DICTTTS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DICTTTS_PLATFORM"])
    try:
        jax.devices()
    except Exception:
        jax.config.update("jax_platforms", "cpu")
        logging.warning("accelerator backend unavailable; binarizing on CPU")

    cfg = load_config(config=args.config, exp_name=args.exp_name, overrides=args.hparams, save=False)
    if args.stage in ("all", "pre_align"):
        cls_path = cfg.get("pre_align_cls", "dicttts_tpu.text.binarizer.BiaobeiPreAlign")
        mod, name = cls_path.rsplit(".", 1)
        getattr(importlib.import_module(mod), name)(cfg).process()
    if args.stage in ("all", "binarize"):
        cls_path = cfg.get("binarizer_cls", "dicttts_tpu.text.binarizer.ZhBinarizer")
        mod, name = cls_path.rsplit(".", 1)
        getattr(importlib.import_module(mod), name)(cfg).process()


if __name__ == "__main__":
    main()
