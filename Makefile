# Convenience entry points (python env is ambient; no pip/apt installs).

.PHONY: test test-slow test-all bench dryrun parity-real

# Fast tier (default, <5 min): everything except @pytest.mark.slow.
test:
	python -m pytest tests/ -q

# Slow tier: flagship-dim parity, training convergence, subprocess gates.
test-slow:
	python -m pytest tests/ -q -m slow

# Both tiers (the trailing -m overrides the pyproject default).
test-all:
	python -m pytest tests/ -q -m "slow or not slow"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py 8

# Real-weights validation: runs the weight-gated golden-asset tests and dumps
# A/B listen files.  Self-skips cleanly until POCKET_TTS_WEIGHTS resolves.
parity-real:
	python scripts/parity_real.py
