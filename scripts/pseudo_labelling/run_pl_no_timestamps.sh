#!/usr/bin/env bash
# PL without timestamp tokens (reference run_pseudo_labelling.sh variant:
# labels as plain text; timestamps re-enabled at distillation time via
# --timestamp_probability need timestamped labels, so prefer run_pl_bs64.sh).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-data/train}
python -m distil_whisper_tpu.cli.run_pseudo_labelling \
  --model_checkpoint "$TEACHER" --dataset_path "$DATA" \
  --output_dir pl_out_nots --per_device_batch_size 64 \
  --max_new_tokens 256 --language en --no_timestamps \
  --speaker_id_column_name speaker_id
