#!/usr/bin/env bash
# Full test-suite macro-benchmark: loop the 15-dataset roster the reference
# evaluates (evaluation_scripts/test/run_baselines.sh:3-7). Point DATA_ROOT
# at a directory with one saved dataset per name below.
set -euo pipefail
MODEL=${MODEL:-ckpts/distil-large-v3}
DATA_ROOT=${DATA_ROOT:-data/test}
SETS=${SETS:-"librispeech.clean librispeech.other common_voice voxpopuli \
ami-ihm ami-sdm peoples_speech tedlium switchboard callhome gigaspeech \
spgispeech chime4 fleurs earnings22"}
mkdir -p evals/test
for s in $SETS; do
  [ -d "$DATA_ROOT/$s" ] || { echo "skip $s (no data)"; continue; }
  python -m distil_whisper_tpu.cli.run_eval \
    --model_checkpoint "$MODEL" --dataset_path "$DATA_ROOT/$s" \
    --mode short --language en --batch_size 16 --max_new_tokens 128 \
    --output_json "evals/test/$s.json"
done
