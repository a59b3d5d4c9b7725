#!/usr/bin/env bash
# Pseudo-label a corpus at the reference's production setting (bs 64,
# timestamps, speaker packing, condition-on-prev; training/README.md:136-138).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-data/train}
python -m distil_whisper_tpu.cli.run_pseudo_labelling \
  --model_checkpoint "$TEACHER" --dataset_path "$DATA" \
  --output_dir pl_out --per_device_batch_size 64 \
  --max_new_tokens 256 --language en \
  --speaker_id_column_name speaker_id
