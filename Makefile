# Convenience targets (analog of the reference Makefile:24-106)

PY ?= python

.PHONY: tests bench bench-e2e native clean docs

tests:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

# BASELINE.md configs 2-6 (pass CONFIGS=5 for the 10k-trajectory run)
CONFIGS ?= 2,3,4,6
bench-e2e:
	$(PY) bench_e2e.py --configs $(CONFIGS) --out PERF.json

# build the native loader explicitly (otherwise built on first use)
native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
	    -o bild_tpu/native/_loader.so bild_tpu/native/loader.cpp

docs:
	@$(PY) -c "import sphinx" 2>/dev/null \
	    && $(PY) -m sphinx -b html docs/ docs/_build/html \
	    || echo "sphinx not installed in this environment; docs/ sources are \
ready (pip install sphinx && make docs)"

clean:
	rm -rf bild_tpu/native/_loader.so **/__pycache__ .pytest_cache docs/_build
