#!/usr/bin/env bash
# Timestamped variant: always train on timestamped pseudo-labels with 0.1 s
# rounding (reference run_distillation_24_2_timestamped.sh + round_timestamps).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-pl_out/dataset}
python -m distil_whisper_tpu.cli.run_distillation \
  --teacher_checkpoint "$TEACHER" --student_checkpoint inits/32_2 \
  --train_dataset_path "$DATA" --output_dir runs/distil-32_2-ts \
  --max_steps 80000 --per_device_train_batch_size 64 \
  --timestamp_probability 1.0 --round_timestamps \
  --condition_on_prev_probability 0.2 \
  --freeze_encoder --precision half_mixed
