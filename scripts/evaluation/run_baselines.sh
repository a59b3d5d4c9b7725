#!/usr/bin/env bash
# Short-form eval of a checkpoint across every local test set (the analogue
# of the reference's evaluation_scripts/test/run_baselines.sh 15-set macro
# benchmark; point TEST_SETS at your save_to_disk dirs).
set -euo pipefail
MODEL=${MODEL:-runs/distil-32_2/end-of-training-weights}
TEST_SETS=${TEST_SETS:-"data/librispeech_test_clean data/librispeech_test_other"}
for ds in $TEST_SETS; do
  name=$(basename "$ds")
  python -m distil_whisper_tpu.cli.run_eval \
    --model_checkpoint "$MODEL" --dataset_path "$ds" \
    --mode short --batch_size 16 --max_new_tokens 128 --language en \
    --output_json "evals/${name}.json"
done
