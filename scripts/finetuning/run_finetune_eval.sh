#!/usr/bin/env bash
# Short-form eval of a fine-tuned checkpoint
# (reference flax/finetuning_scripts/run_librispeech_eval.sh).
set -euo pipefail
MODEL=${MODEL:-runs/finetune/final}
DATA=${DATA:-data/val}
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$MODEL" --dataset_path "$DATA" --mode short \
  --language en --batch_size 16 --max_new_tokens 128 \
  --output_json evals/finetune.json
