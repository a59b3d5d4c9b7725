#!/usr/bin/env bash
# Orbax train state -> HF safetensors checkpoint
# (reference conversion_scripts/run_convert_distilled_train_state_to_hf.sh).
set -euo pipefail
CKPT=${CKPT:-runs/distil-32_2/checkpoints/step-80000}
BASE=${BASE:-inits/32_2}
python -m distil_whisper_tpu.cli.convert_checkpoint_to_hf \
  --checkpoint_dir "$CKPT" --base_checkpoint "$BASE" \
  --save_dir runs/distil-32_2/hf
