# Development targets (the reference's Makefile is lint-only; no linters are
# baked into this image, so `check` uses compileall + the test suite).

.PHONY: test check bench dryrun

test:
	python -m pytest tests/ -q

check:
	python -m compileall -q distil_whisper_tpu
	python -m pytest tests/ -x -q

bench:
	python bench.py

dryrun:
	python __graft_entry__.py
