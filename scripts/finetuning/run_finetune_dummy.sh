#!/usr/bin/env bash
# Tiny-model smoke run, the reference's de-facto unit test
# (flax/finetuning_scripts/run_librispeech_dummy.sh).
set -euo pipefail
MODEL=${MODEL:-ckpts/tiny-random-whisper}
DATA=${DATA:-data/dummy}
python -m distil_whisper_tpu.cli.run_finetuning \
  --model_checkpoint "$MODEL" --train_dataset_path "$DATA" \
  --output_dir runs/finetune-dummy --max_steps 10 \
  --per_device_train_batch_size 2 --learning_rate 1e-4 --warmup_steps 2 \
  --language en --save_steps 10
