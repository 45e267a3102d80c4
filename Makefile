.PHONY: test test-fast bench dryrun lint

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not parity"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py dryrun 8

lint:
	python -m pyflakes s3od_tpu tests bench.py __graft_entry__.py 2>/dev/null || true
