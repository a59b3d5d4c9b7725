#!/usr/bin/env bash
# Student init: copy the whisper-tiny encoder, maximally-spaced 1-layer decoder
# (reference flax/initialisation_scripts/run_tiny_2_1_init.sh).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-tiny}
python -m distil_whisper_tpu.cli.create_student_model \
  --teacher_checkpoint "$TEACHER" --decoder_layers 1 \
  --save_dir inits/tiny_2_1
