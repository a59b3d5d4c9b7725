#!/usr/bin/env bash
# Dummy end-to-end smoke run on a tiny random checkpoint — the role of the
# reference's finetuning_scripts/run_librispeech_dummy.sh.  Builds its own
# fixtures (tiny torch teacher + tone dataset) via the test suite's workspace.
set -euo pipefail
python -m pytest tests/test_cli_e2e.py -x -q
