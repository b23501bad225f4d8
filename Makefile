# Developer targets (parity: reference Makefile test-all/format contract)

.PHONY: test test-all test-fast bench graft-dryrun

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
