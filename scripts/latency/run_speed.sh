#!/usr/bin/env bash
# RTFx benchmark, distil vs teacher vs the reference stack on one chip
# (reference latency_scripts/run_speed.sh / run_speed_pt.py).
set -euo pipefail
BENCH_BATCH=${BENCH_BATCH:-16} BENCH_TOKENS=${BENCH_TOKENS:-128} python bench.py
