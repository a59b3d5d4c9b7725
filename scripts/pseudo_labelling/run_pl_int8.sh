#!/usr/bin/env bash
# Max-throughput PL: full int8 stack (encoder W8A8 + decoder projections
# + int8 lm-head logits matmul
# + self-KV + cross-KV) + 4 featurizer subprocess workers + bs32/128-token
# budget — 403 audio-h/h per v5e chip measured (docs/PERFORMANCE.md).
# NB: int8 is approximate; validate pseudo-label WER on a val split first
# (run with --compute_wer on a held-out slice).
set -euo pipefail
TEACHER=${TEACHER:-ckpts/whisper-large-v3}
DATA=${DATA:-data/train}
python -m distil_whisper_tpu.cli.run_pseudo_labelling \
  --model_checkpoint "$TEACHER" --dataset_path "$DATA" \
  --output_dir pl_out --per_device_batch_size 32 --max_new_tokens 128 \
  --language en --quantize_cross_kv --quantize_self_kv --quantize_encoder \
  --quantize_decoder --quantize_lm_head \
  --featurizer_workers 4 --speaker_id_column_name speaker_id
