.PHONY: test test-fast test-full bench dryrun lint

# Fast tier (default, <6 min): everything except `slow`-marked tests
# (pyproject addopts). This is the CI green gate.
test:
	python -m pytest tests/ -x -q

# Fastest inner loop: also skip the torch-oracle parity tests.
test-fast:
	python -m pytest tests/ -x -q -m "not parity and not slow"

# Full tier (~25 min on CPU): everything, including the slow kernel
# grad matrices and deep oracle parity.
test-full:
	python -m pytest tests/ -x -q -m "slow or not slow"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py dryrun 8

lint:
	python -m pyflakes s3od_tpu tests bench.py __graft_entry__.py 2>/dev/null || true
