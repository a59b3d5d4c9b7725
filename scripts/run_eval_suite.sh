#!/usr/bin/env bash
# Evaluate a checkpoint in all four inference modes (reference
# evaluation_scripts/test/ role).
set -euo pipefail
CKPT=${1:?usage: run_eval_suite.sh <checkpoint> <dataset> [teacher]}
DATA=${2:?}
for MODE in short sequential chunked; do
  python -m distil_whisper_tpu.cli.run_eval \
    --model_checkpoint "$CKPT" --dataset_path "$DATA" \
    --mode "$MODE" --language en --batch_size 16 \
    --output_json "eval_${MODE}.json"
done
if [ -n "${3:-}" ]; then
  python -m distil_whisper_tpu.cli.run_eval \
    --model_checkpoint "$3" --assistant_checkpoint "$CKPT" \
    --dataset_path "$DATA" --mode speculative --language en \
    --output_json eval_speculative.json
fi
