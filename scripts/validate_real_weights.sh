#!/usr/bin/env bash
# Real-weights conformance pack: the day real checkpoints are available,
# this ONE command turns them into a pass/fail verdict against the
# published reference numbers (BASELINE.md) and resolves every
# "WER unvalidated in-sandbox" caveat in docs/QUANTIZATION.md.
#
#   scripts/validate_real_weights.sh CHECKPOINT_DIR DATASET [SPLIT]
#
#   CHECKPOINT_DIR  HF-format checkpoint (e.g. ./distil-large-v3)
#   DATASET         datasets save_to_disk dir / .arrow / JSONL manifest
#                   with {"audio", "text"} rows (short-form, e.g.
#                   LibriSpeech test-clean)
#   SPLIT           optional split name inside a DatasetDict
#
# Environment knobs:
#   LONG_DATASET     long-form dataset for sequential/chunked modes
#                    (default: $DATASET — fine if it has >30 s rows)
#   LANGUAGE         default en
#   BATCH            default 16
#   OUT_DIR          default ./real_weights_validation
#   EXPECTED_SHORT   expected short-form WER %, default from the published
#                    table (distil-large-v3: 9.7, BASELINE.md)
#   SHORT_TOL        abs tolerance on short-form WER (default 0.5; the
#                    north-star "within 0.1 of reference" applies when the
#                    dataset matches the paper's eval exactly)
#   INT8_TOL         max WER regression of the full int8 stack vs bf16
#                    (default 0.5 abs)
#   SEQ_TOL          max amount sequential may trail chunked (default 0.2;
#                    reference says sequential is usually BETTER,
#                    README.md:158-171)
set -euo pipefail

CKPT=${1:?usage: validate_real_weights.sh CHECKPOINT_DIR DATASET [SPLIT]}
DATASET=${2:?usage: validate_real_weights.sh CHECKPOINT_DIR DATASET [SPLIT]}
SPLIT=${3:-}
LONG_DATASET=${LONG_DATASET:-$DATASET}
LANGUAGE=${LANGUAGE:-en}
BATCH=${BATCH:-16}
OUT_DIR=${OUT_DIR:-./real_weights_validation}
EXPECTED_SHORT=${EXPECTED_SHORT:-9.7}
SHORT_TOL=${SHORT_TOL:-0.5}
INT8_TOL=${INT8_TOL:-0.5}
SEQ_TOL=${SEQ_TOL:-0.2}
MAX_NEW=${MAX_NEW:-128}          # per-window generation budget
DTYPE=${DTYPE:-bfloat16}         # rehearsals pin float32 on CPU

mkdir -p "$OUT_DIR"
SPLIT_ARGS=()
[ -n "$SPLIT" ] && SPLIT_ARGS=(--split "$SPLIT")

run_eval() {
    local name=$1; shift
    echo "== $name =="
    python -m distil_whisper_tpu.cli.run_eval \
        --model_checkpoint "$CKPT" --language "$LANGUAGE" \
        --batch_size "$BATCH" --max_new_tokens "$MAX_NEW" \
        --dtype "$DTYPE" --output_json "$OUT_DIR/$name.json" \
        "${SPLIT_ARGS[@]}" "$@"
}

# 1. short-form, bf16 (the published short-form WER row)
run_eval short_bf16 --dataset_path "$DATASET" --mode short

# 2. short-form, FULL int8 serving stack (encoder + decoder + self/cross
#    KV + lm head) — resolves the docs/QUANTIZATION.md caveat
run_eval short_int8 --dataset_path "$DATASET" --mode short \
    --quantize_encoder --quantize_decoder --quantize_self_kv \
    --quantize_cross_kv --quantize_lm_head

# 3. long-form, sequential (condition-on-prev, fallback ladder)
run_eval seq_bf16 --dataset_path "$LONG_DATASET" --mode sequential \
    --condition_on_prev

# 4. long-form, chunked (the pipeline default)
run_eval chunked_bf16 --dataset_path "$LONG_DATASET" --mode chunked

python - "$OUT_DIR" "$EXPECTED_SHORT" "$SHORT_TOL" "$INT8_TOL" "$SEQ_TOL" <<'PY'
import json, sys
out, expected_short, short_tol, int8_tol, seq_tol = (
    sys.argv[1], *(float(x) for x in sys.argv[2:6]))
wer = {}
for name in ("short_bf16", "short_int8", "seq_bf16", "chunked_bf16"):
    with open(f"{out}/{name}.json") as f:
        wer[name] = json.load(f)["wer"]
checks = [
    ("short-form bf16 WER vs published",
     wer["short_bf16"] <= expected_short + short_tol,
     f"{wer['short_bf16']:.2f} <= {expected_short} + {short_tol}"),
    ("int8 stack WER delta vs bf16",
     wer["short_int8"] - wer["short_bf16"] <= int8_tol,
     f"{wer['short_int8'] - wer['short_bf16']:+.2f} <= {int8_tol}"),
    ("sequential vs chunked long-form",
     wer["seq_bf16"] <= wer["chunked_bf16"] + seq_tol,
     f"{wer['seq_bf16']:.2f} <= {wer['chunked_bf16']:.2f} + {seq_tol}"),
]
print(json.dumps({"wer": wer}, indent=2))
failed = False
for name, ok, detail in checks:
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}")
    failed |= not ok
sys.exit(1 if failed else 0)
PY
