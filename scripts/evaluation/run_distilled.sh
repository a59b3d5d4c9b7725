#!/usr/bin/env bash
# Short-form eval of a distilled checkpoint
# (reference evaluation_scripts/run_distilled.sh).
set -euo pipefail
MODEL=${MODEL:-runs/distil-32_2/final}
DATA=${DATA:-data/val}
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$MODEL" --dataset_path "$DATA" --mode short \
  --language en --batch_size 16 --max_new_tokens 128 \
  --output_json evals/distilled.json
