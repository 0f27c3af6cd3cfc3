"""Convert reference (PyTorch) checkpoints into this framework's format.

    # HiFi-GAN vocoder generator (readme.md:65-74 pretrained)
    python scripts/convert_torch_ckpt.py --model hifigan \
        --src pretrained/hifigan_hifitts/model_ckpt_steps_2168000.ckpt \
        --dst checkpoints/hifigan_converted

    # full Dict-TTS acoustic model (readme.md:96-101 released
    # dicttts_biaobei_wo_gumbel checkpoint)
    python scripts/convert_torch_ckpt.py --model dict_tts \
        --src checkpoints/dicttts_biaobei_wo_gumbel/model_ckpt_steps_300000.ckpt \
        --dst checkpoints/dicttts_converted

Weight norm is folded; numerical parity of every converted module against
the actual reference torch modules is proven by tests/test_model_parity.py
(whole-model mel parity ~3e-7) and tests/test_torch_convert.py.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="torch .ckpt/.pt path")
    p.add_argument("--dst", required=True, help="output work dir")
    p.add_argument("--model", choices=["hifigan", "dict_tts"], default="hifigan")
    p.add_argument("--step", type=int, default=0)
    args = p.parse_args()

    from dicttts_tpu.utils.checkpoint import save_checkpoint
    from dicttts_tpu.utils.torch_convert import (
        convert_dict_tts,
        convert_hifigan_generator,
        load_torch_checkpoint,
        strip_prefix,
    )

    state = load_torch_checkpoint(args.src)
    if args.model == "hifigan":
        params = convert_hifigan_generator(state)
    else:
        # the reference task saves the model under the 'model.' child prefix
        # (utils/trainer.py:436-449 state_dict slicing)
        if any(k.startswith("model.") for k in state):
            state = strip_prefix(state, "model.")
        params = convert_dict_tts(state)
    path = save_checkpoint(args.dst, args.step, {"params_g": params}, keep=1)
    import jax

    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"| converted {n / 1e6:.2f}M params ({args.model}) -> {path}")


if __name__ == "__main__":
    main()
