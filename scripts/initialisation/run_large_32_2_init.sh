#!/usr/bin/env bash
# Student init: copy the whisper-large-v3 encoder, maximally-spaced 2-layer decoder
# (reference flax/initialisation_scripts/run_large_32_2_init.sh).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
python -m distil_whisper_tpu.cli.create_student_model \
  --teacher_checkpoint "$TEACHER" --decoder_layers 2 \
  --save_dir inits/large_32_2
