#!/usr/bin/env bash
# Long-form-budget RTFx (256-token windows, the PL/sequential regime)
# (reference latency_scripts/run_speed_longform.sh).
set -euo pipefail
BENCH_BATCH=${BENCH_BATCH:-16} BENCH_TOKENS=256 python bench.py
