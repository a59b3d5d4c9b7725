#!/usr/bin/env bash
# Noise robustness: WER at SNR +40 dB .. -10 dB (reference
# noise_evaluation_scripts/run_distilled.sh).
set -euo pipefail
MODEL=${MODEL:-runs/distil-32_2/end-of-training-weights}
DS=${DS:-data/librispeech_test_clean}
for snr in 40 30 20 10 5 0 -5 -10; do
  python -m distil_whisper_tpu.cli.run_eval \
    --model_checkpoint "$MODEL" --dataset_path "$DS" \
    --mode short --language en --noise_snr_db "$snr" \
    --output_json "evals/noise_snr${snr}.json"
done
