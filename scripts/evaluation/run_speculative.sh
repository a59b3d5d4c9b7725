#!/usr/bin/env bash
# Speculative decoding probe: teacher + distil draft, identical outputs,
# acceptance rate + speedup (reference run_speculative_decoding.py +
# latency scripts).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DRAFT=${DRAFT:-runs/distil-32_2/end-of-training-weights}
DS=${DS:-data/librispeech_test_clean}
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$TEACHER" --dataset_path "$DS" \
  --mode speculative --assistant_checkpoint "$DRAFT" --gamma 5 \
  --language en --output_json evals/speculative.json
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$TEACHER" --dataset_path "$DS" \
  --mode short --language en --output_json evals/teacher_alone.json
