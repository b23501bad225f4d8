# Developer targets (parity: reference Makefile test-all/format contract)

.PHONY: check test test-all test-fast bench graft-dryrun

# Collection-only gate: seconds, no compiles. Run before every commit/snapshot
# (round-3 regression: a @pytest.mark without `import pytest` killed the whole suite).
check:
	python -m pytest tests/ --collect-only -q

test:
	python -m pytest tests/ -x -q

test-all:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

graft-dryrun:
	python __graft_entry__.py
