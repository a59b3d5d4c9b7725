#!/usr/bin/env bash
# Chunked long-form with timestamps + hallucination metrics
# (reference long_form_transcription_scripts/run_tedlium_long_form_timestamps.sh).
set -euo pipefail
MODEL=${MODEL:-ckpts/distil-large-v3}
DATA=${DATA:-data/longform}
python -m distil_whisper_tpu.cli.run_long_form_transcription \
  --model_checkpoint "$MODEL" --dataset_path "$DATA" \
  --return_timestamps --batch_size 16 --chunk_length_s 25 \
  --language en --output_json evals/longform_ts.json
