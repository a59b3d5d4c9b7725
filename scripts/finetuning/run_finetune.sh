#!/usr/bin/env bash
# Plain CE fine-tuning (reference flax/finetuning_scripts/run_librispeech.sh).
set -euo pipefail
MODEL=${MODEL:-ckpts/whisper-small.en}
DATA=${DATA:-data/train}
python -m distil_whisper_tpu.cli.run_finetuning \
  --model_checkpoint "$MODEL" --train_dataset_path "$DATA" \
  --output_dir runs/finetune --max_steps 5000 \
  --per_device_train_batch_size 64 --learning_rate 1e-4 --warmup_steps 500 \
  --label_smoothing 0.1 --precision half_mixed --gradient_checkpointing \
  --language en --save_steps 1000 --save_total_limit 1
