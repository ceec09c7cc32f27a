# Convenience entry points (python env is ambient; no pip/apt installs).

.PHONY: test bench dryrun parity-real

test:
	python -m pytest tests/ -q

bench:
	python bench.py

dryrun:
	python __graft_entry__.py 8

# Real-weights validation: runs the weight-gated golden-asset tests and dumps
# A/B listen files.  Self-skips cleanly until POCKET_TTS_WEIGHTS resolves.
parity-real:
	python scripts/parity_real.py
