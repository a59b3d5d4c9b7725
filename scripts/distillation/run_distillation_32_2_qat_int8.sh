#!/usr/bin/env bash
# The 32_2 recipe with student-side quantization-aware training
# (--quantize_student w8a8, ops/qat.py): the student's decoder forward is
# fake-quantized with the EXACT serve-time int8 numerics (W8A8 per-channel
# weights + dynamic per-token activations) and straight-through gradients,
# so the exported checkpoint serves faithfully under
#   run_eval --quantize_decoder   (and the rest of the int8 stack).
# Combine with --teacher_precision int8 for the fast teacher side: the two
# are independent (teacher = no-grad inference path, student = QAT loss).
# w8a8 is the serve-matching mode (the int8 stack always quantizes
# activations dynamically); 'weights' is an ablation knob only.
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-pl_out/dataset}

python -m distil_whisper_tpu.cli.create_student_model \
  --teacher_checkpoint "$TEACHER" --decoder_layers 2 \
  --save_dir inits/32_2

python -m distil_whisper_tpu.cli.run_distillation \
  --teacher_checkpoint "$TEACHER" --student_checkpoint inits/32_2 \
  --train_dataset_path "$DATA" --output_dir runs/distil-32_2-qat \
  --max_steps 80000 --per_device_train_batch_size 64 \
  --learning_rate 1e-4 --warmup_steps 500 \
  --lr_scheduler_type constant_with_warmup \
  --wer_threshold 10 --timestamp_probability 0.2 \
  --condition_on_prev_probability 0.2 \
  --freeze_encoder --precision half_mixed \
  --teacher_precision int8 \
  --quantize_student w8a8 \
  --eval_steps 1000 --save_steps 1000 --save_total_limit 1
