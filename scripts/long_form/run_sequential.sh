#!/usr/bin/env bash
# Sequential (OpenAI-style sliding window) long-form with the full fallback
# ladder (reference training/run_eval.py:712-735 semantics).
set -euo pipefail
MODEL=${MODEL:-ckpts/distil-large-v3}
DATA=${DATA:-data/longform}
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$MODEL" --dataset_path "$DATA" --mode sequential \
  --return_timestamps --condition_on_prev \
  --temperature_fallback 0.0,0.2,0.4,0.6,0.8,1.0 \
  --logprob_threshold -1.0 --no_speech_threshold 0.6 \
  --compression_ratio_threshold 1.35 \
  --language en --output_json evals/sequential.json
