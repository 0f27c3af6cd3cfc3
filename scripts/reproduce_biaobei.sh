#!/usr/bin/env bash
# One-command Biaobei reproduction runbook (VERDICT r2 #10).
#
# Chains the full reference workflow (/root/reference/readme.md:86-117):
#   pre-align -> [MFA train+align when the `mfa` binary exists] ->
#   binarize (RoFormer gloss bank when cfg lm_model points at local
#   weights; deterministic fallback otherwise) -> train -> infer ->
#   PER against scripts/pron_label/label_set0.csv.
#
# The day real assets land (Biaobei corpus at $RAW, roformer-chinese-base
# weights, optionally a converted reference checkpoint via
# scripts/convert_torch_ckpt.py), the PER ~= 1.93% anchor is:
#
#     scripts/reproduce_biaobei.sh data/raw/biaobei dicttts_biaobei
#
# Smoke-tested end-to-end on a miniature synthetic corpus by
# tests/test_reproduce_runbook.py.
set -euo pipefail
cd "$(dirname "$0")/.."

RAW=${1:-data/raw/biaobei}
EXP=${2:-dicttts_biaobei}
CFG=${CFG:-dicttts_tpu/configs/datasets/biaobei/dict_tts.yaml}
LABELS=${LABELS:-scripts/pron_label/label_set0.csv}
HP=${HP:-}   # extra --hparams overrides, e.g. HP="max_updates=300000"
COMMON_HP="raw_data_dir=${RAW}${HP:+,$HP}"

echo "== [1/5] pre-align + binarize (config: $CFG, raw: $RAW)"
python -m dicttts_tpu.text.binarize --config "$CFG" --stage pre_align \
    --hparams "$COMMON_HP"

if command -v mfa >/dev/null 2>&1; then
    echo "== [2/5] MFA train + align"
    python - "$CFG" "$COMMON_HP" <<'PY'
import sys
from dicttts_tpu.config import load_config
from dicttts_tpu.text.mfa import mfa_train_and_align
cfg = load_config(config=sys.argv[1], overrides=sys.argv[2], save=False)
mfa_train_and_align(cfg)
PY
else
    echo "== [2/5] MFA binary not found — uniform alignment fallback" \
         "(install montreal-forced-aligner for the published-quality anchor)"
fi

echo "== [3/5] binarize (dict bank uses RoFormer when lm_model is local)"
python -m dicttts_tpu.text.binarize --config "$CFG" --stage binarize \
    --hparams "$COMMON_HP"

echo "== [4/5] train to max_updates, then infer the test split"
python -m dicttts_tpu.run --config "$CFG" --exp_name "$EXP" --hparams "$COMMON_HP"
python -m dicttts_tpu.run --config "$CFG" --exp_name "$EXP" --infer \
    --hparams "$COMMON_HP"

echo "== [5/5] PER vs $LABELS"
if [ -f "$LABELS" ]; then
    python scripts/get_pron_error.py \
        --pred "checkpoints/$EXP/generated/meta.csv" --labels "$LABELS"
else
    echo "label file $LABELS missing — skipping the PER anchor" \
         "(copy the reference's scripts/pron_label/label_set0.csv)"
fi
echo "== done: checkpoints/$EXP"
