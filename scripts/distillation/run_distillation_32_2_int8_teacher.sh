#!/usr/bin/env bash
# The 32_2 recipe with --teacher_precision int8: the no-grad teacher side
# of every step (frozen shared encoder + teacher decode) runs on W8A8 int8
# projections + the bf16 fast-attention stack, measured +60% step
# throughput (633 -> 1010 audio-s/s per chip at bs16, docs/PERFORMANCE.md).
# Caveats: KL targets shift within the int8-stack bounds, and under the
# shared frozen encoder the student trains on the int8 teacher's encoder
# states (train/serve feature skew unless serving also uses
# --quantize_encoder).  Validate WER on a real checkpoint before production.
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-pl_out/dataset}

python -m distil_whisper_tpu.cli.create_student_model \
  --teacher_checkpoint "$TEACHER" --decoder_layers 2 \
  --save_dir inits/32_2

python -m distil_whisper_tpu.cli.run_distillation \
  --teacher_checkpoint "$TEACHER" --student_checkpoint inits/32_2 \
  --train_dataset_path "$DATA" --output_dir runs/distil-32_2-int8t \
  --max_steps 80000 --per_device_train_batch_size 64 \
  --learning_rate 1e-4 --warmup_steps 500 \
  --lr_scheduler_type constant_with_warmup \
  --wer_threshold 10 --timestamp_probability 0.2 \
  --condition_on_prev_probability 0.2 \
  --freeze_encoder --precision half_mixed \
  --teacher_precision int8 \
  --eval_steps 1000 --save_steps 1000 --save_total_limit 1
