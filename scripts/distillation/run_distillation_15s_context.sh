#!/usr/bin/env bash
# 15 s-context student: truncate encoder positions at init (reference
# run_distillation_15s_context.sh; flax create_student_model
# --max_source_positions).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-pl_out/dataset}
python -m distil_whisper_tpu.cli.create_student_model \
  --teacher_checkpoint "$TEACHER" --decoder_layers 2 \
  --max_source_positions 750 --save_dir inits/32_2_15s
python -m distil_whisper_tpu.cli.run_distillation \
  --teacher_checkpoint "$TEACHER" --student_checkpoint inits/32_2_15s \
  --train_dataset_path "$DATA" --output_dir runs/distil-32_2-15s \
  --max_duration_s 15 --max_steps 80000 \
  --per_device_train_batch_size 64 --train_encoder --precision half_mixed
