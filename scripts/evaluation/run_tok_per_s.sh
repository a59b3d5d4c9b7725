#!/usr/bin/env bash
# Fixed-token tokens/s benchmark on dummy encoder outputs (reference
# --precise_tok_per_s, run_eval.py:806-844).
set -euo pipefail
MODEL=${MODEL:-runs/distil-32_2/end-of-training-weights}
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$MODEL" --dataset_path "${DS:-data/any}" \
  --precise_tok_per_s --batch_size 16 --max_new_tokens 128
