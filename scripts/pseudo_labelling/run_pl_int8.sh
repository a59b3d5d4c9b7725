#!/usr/bin/env bash
# Max-throughput PL: int8 cross-KV + bs32/128-token budget — 344 audio-h/h
# per v5e chip measured (docs/PERFORMANCE.md).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-data/train}
python -m distil_whisper_tpu.cli.run_pseudo_labelling \
  --model_checkpoint "$TEACHER" --dataset_path "$DATA" \
  --output_dir pl_out --per_device_batch_size 32 --max_new_tokens 128 \
  --language en --quantize_cross_kv --speaker_id_column_name speaker_id
