#!/usr/bin/env bash
# Pseudo-label a corpus with whisper-large-v3 (speaker-aware 30 s packing,
# timestamps, condition-on-prev prompts) — reference pseudo_labelling_scripts.
set -euo pipefail
python -m distil_whisper_tpu.cli.run_pseudo_labelling \
  --model_checkpoint "${TEACHER:-ckpts/whisper-large-v3}" \
  --dataset_path "${DATA:-data/train}" \
  --output_dir pl_out \
  --per_device_batch_size 32 \
  --language en \
  --speaker_id_column_name speaker_id \
  --max_new_tokens 256
