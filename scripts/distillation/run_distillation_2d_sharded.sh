#!/usr/bin/env bash
# Multi-chip FSDP-style run: params + AdamW moments sharded over the full
# ('data','model') mesh (--param_sharding 2d), gradient checkpointing on.
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-pl_out/dataset}
python -m distil_whisper_tpu.cli.run_distillation \
  --teacher_checkpoint "$TEACHER" --student_checkpoint inits/32_2 \
  --train_dataset_path "$DATA" --output_dir runs/distil-32_2-2d \
  --model_parallel 2 --param_sharding 2d --gradient_checkpointing \
  --streaming --max_steps 80000 --per_device_train_batch_size 64 \
  --freeze_encoder --precision half_mixed
