#!/usr/bin/env bash
# Chunked + sequential long-form eval with hallucination metrics
# (reference long_form_transcription_scripts/).
set -euo pipefail
MODEL=${MODEL:-runs/distil-32_2/end-of-training-weights}
DS=${DS:-data/earnings22}
python -m distil_whisper_tpu.cli.run_long_form_transcription \
  --model_checkpoint "$MODEL" --dataset_path "$DS" \
  --chunk_length_s 25 --batch_size 16 --language en \
  --output_json evals/longform_chunked.json
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$MODEL" --dataset_path "$DS" --mode sequential \
  --condition_on_prev --max_new_tokens 224 --language en \
  --output_json evals/longform_sequential.json
