#!/usr/bin/env bash
# Tiny-model eval smoke run (reference evaluation_scripts/run_librispeech_eval_dummy.sh).
set -euo pipefail
MODEL=${MODEL:-ckpts/tiny-random-whisper}
DATA=${DATA:-data/dummy}
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$MODEL" --dataset_path "$DATA" --mode short \
  --language en --batch_size 2 --max_new_tokens 16 --dtype float32 \
  --output_json evals/dummy.json
