#!/usr/bin/env bash
# Streaming-input smoke run (reference distillation_scripts/run_librispeech_streaming_dummy.sh).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/tiny-random-whisper}
STUDENT=${STUDENT:-inits/tiny_2_1}
DATA=${DATA:-data/dummy}
python -m distil_whisper_tpu.cli.run_distillation \
  --teacher_checkpoint "$TEACHER" --student_checkpoint "$STUDENT" \
  --train_dataset_path "$DATA" --output_dir runs/distil-dummy \
  --streaming --shuffle_buffer_size 64 --max_steps 10 \
  --per_device_train_batch_size 2 --learning_rate 1e-4 --warmup_steps 2 \
  --no_pseudo_labels --save_steps 10
