#!/usr/bin/env bash
# Short-form eval on the int8 MXU inference path (encoder W8A8 + int8 KV
# caches): 950 RTFx at bs16/256tok vs 762 on the reference stack (BENCH).
# Run once WITHOUT the quantize flags and compare WER before adopting.
set -euo pipefail
MODEL=${MODEL:-ckpts/distil-large-v3}
DATA=${DATA:-data/librispeech_test_clean}
python -m distil_whisper_tpu.cli.run_eval \
  --model_checkpoint "$MODEL" --dataset_path "$DATA" \
  --mode short --batch_size 16 --max_new_tokens 128 --language en \
  --quantize_encoder --quantize_self_kv --quantize_cross_kv \
  --output_json eval_int8.json
