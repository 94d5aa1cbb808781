# Developer entry points (parity with the reference's CMake harness,
# SURVEY.md §2.18: build + auto-discovered tests + sanitized builds).

PY ?= python

.PHONY: test test-full golden golden-asan native bench clean

# Default (shallow fuzz depth, 4 workers): ~4-5 min on a 4-CPU box.
test:
	$(PY) -m pytest tests/ -q -n 4

# Full randomized sweeps (pre-commit / CI depth; shallow is a seed-prefix
# of full, so repros only need the env var).
test-full:
	QUBLAS_TEST_DEPTH=full $(PY) -m pytest tests/ -q -n 4

# Regenerate golden vectors from the compiled C++ reference (needs g++ and
# /root/reference; override with QUBLAS_REF=<path>).
golden:
	$(PY) tools/gen_golden.py

# Same, with the oracle compiled under ASan+UBSan (the reference's own
# builds always carry sanitizers, CMakeLists.txt:17,26).  Slow.
golden-asan:
	QUBLAS_GOLDEN_SAN=1 $(PY) tools/gen_golden.py

# Native host engine (also built automatically on first import).
native:
	g++ -O2 -shared -fPIC -o native/libqublas_host.so native/qublas_host.cpp

bench:
	$(PY) bench.py

clean:
	rm -f native/libqublas_host.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
