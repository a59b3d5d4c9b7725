#!/usr/bin/env bash
# Full distil-large-v3 recipe (matches the reference's
# distillation_scripts/run_distillation_32_2.sh hyperparameters:
# 80k steps, bs 64/device, constant-with-warmup 1e-4, WER filter 10%,
# timestamp prob 0.2, condition-on-prev prob 0.2, frozen shared encoder).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-pl_out/dataset}

python -m distil_whisper_tpu.cli.create_student_model \
  --teacher_checkpoint "$TEACHER" --decoder_layers 2 --save_dir distil-init

python -m distil_whisper_tpu.cli.run_distillation \
  --teacher_checkpoint "$TEACHER" \
  --student_checkpoint distil-init \
  --train_dataset_path "$DATA" \
  --output_dir distil-large-v3-run \
  --max_steps 80000 \
  --per_device_train_batch_size 64 \
  --learning_rate 1e-4 --warmup_steps 500 \
  --lr_scheduler_type constant_with_warmup \
  --wer_threshold 10 \
  --timestamp_probability 0.2 \
  --condition_on_prev_probability 0.2 \
  --freeze_encoder --precision half_mixed \
  --eval_steps 1000 --save_steps 1000 --save_total_limit 1
