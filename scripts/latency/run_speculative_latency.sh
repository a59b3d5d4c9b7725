#!/usr/bin/env bash
# Speculative-decoding latency structure at batch 1
# (reference latency_scripts/run_speculative.sh).
set -euo pipefail
BENCH_BATCH=1 GAMMA=${GAMMA:-5} python scripts/bench_speculative.py
