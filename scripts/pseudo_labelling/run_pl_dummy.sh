#!/usr/bin/env bash
# Tiny-model PL smoke run
# (reference pseudo_labelling_scripts/run_librispeech_pseudo_labelling_dummy.sh).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/tiny-random-whisper}
DATA=${DATA:-data/dummy}
python -m distil_whisper_tpu.cli.run_pseudo_labelling \
  --model_checkpoint "$TEACHER" --dataset_path "$DATA" \
  --output_dir pl_dummy --per_device_batch_size 2 --max_new_tokens 16 \
  --language en --dtype float32 --compute_wer
