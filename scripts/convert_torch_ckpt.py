"""Convert a reference (PyTorch) HiFi-GAN vocoder checkpoint into this
framework's checkpoint format.

    python scripts/convert_torch_ckpt.py --src pretrained/hifigan/model.ckpt \
        --dst checkpoints/hifigan_converted

Weight norm is folded; layer parity is tested in tests/test_torch_convert.py.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="torch .ckpt/.pt path")
    p.add_argument("--dst", required=True, help="output work dir")
    p.add_argument("--step", type=int, default=0)
    args = p.parse_args()

    from dicttts_tpu.utils.checkpoint import save_checkpoint
    from dicttts_tpu.utils.torch_convert import convert_hifigan_generator, load_torch_checkpoint

    state = load_torch_checkpoint(args.src)
    params = convert_hifigan_generator(state)
    path = save_checkpoint(args.dst, args.step, {"params_g": params}, keep=1)
    n = sum(v.size for tree in params.values() for v in tree.values())
    print(f"| converted {n/1e6:.2f}M params -> {path}")


if __name__ == "__main__":
    main()
