#!/usr/bin/env bash
# Student init: copy the whisper-small.en encoder, maximally-spaced 2-layer decoder
# (reference flax/initialisation_scripts/run_small_12_2_init.sh).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-small.en}
python -m distil_whisper_tpu.cli.create_student_model \
  --teacher_checkpoint "$TEACHER" --decoder_layers 2 \
  --save_dir inits/small_12_2
