#!/usr/bin/env bash
# medium.en -> 24_2 student with timestamped labels
# (reference distillation_scripts/run_distillation_24_2_timestamped.sh).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-medium.en}
DATA=${DATA:-pl_out/dataset}
python -m distil_whisper_tpu.cli.create_student_model \
  --teacher_checkpoint "$TEACHER" --decoder_layers 2 --save_dir inits/24_2
python -m distil_whisper_tpu.cli.run_distillation \
  --teacher_checkpoint "$TEACHER" --student_checkpoint inits/24_2 \
  --train_dataset_path "$DATA" --output_dir runs/distil-24_2-ts \
  --max_steps 80000 --per_device_train_batch_size 64 \
  --learning_rate 1e-4 --warmup_steps 500 --wer_threshold 10 \
  --timestamp_probability 0.5 --round_timestamps \
  --condition_on_prev_probability 0.2 \
  --freeze_encoder --precision half_mixed \
  --eval_steps 1000 --save_steps 1000 --save_total_limit 1
