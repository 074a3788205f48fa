.PHONY: test lint format bench precompile

test:
	python -m pytest tests/ -q

lint:
	ruff check smplfitter_tpu tests bench.py __graft_entry__.py

format:
	ruff format smplfitter_tpu tests bench.py __graft_entry__.py

bench:
	python bench.py

precompile:
	python -m smplfitter_tpu.precompile --synthetic
