#!/usr/bin/env bash
# Measured speculative speedup vs controlled per-token acceptance
# (synthetic_acceptance oracle; both models run full compute):
# 1.70x / 2.51x / 3.26x at 60/80/95% on v5e (docs/PERFORMANCE.md).
set -euo pipefail
BENCH_BATCH=${BENCH_BATCH:-1} GAMMA=${GAMMA:-5} \
  python scripts/bench_speculative.py
