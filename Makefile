# Developer entry points (parity with the reference's CMake harness,
# SURVEY.md §2.18: build + auto-discovered tests + sanitized builds).

PY ?= python
ROUND ?= 05

.PHONY: test test-full golden golden-asan native bench clean \
        tpu-differential fuzz-smoke fuzz-full round-evidence

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

# --- per-round evidence ritual (VERDICT r4 weak-5) ----------------------
# Run all three before closing a round; artifact names are checked into
# the repo.  tpu-differential MUST run on the real chip (no JAX_PLATFORMS
# override) after touching device-op code — CPU-clean != TPU-clean.

# On-hardware differential sweep (eager+jit vs oracle, every dispatch
# route; ~30 compiles, minutes through the tunnel).  Writes the committed
# evidence file for the round.
tpu-differential:
	$(PY) tools/tpu_differential.py 2>&1 | tee TPU_DIFFERENTIAL_r$(ROUND).txt

# Quick randomized differential sweep (~200 trials/family, minutes) on the
# virtual 8-device mesh — the smoke gate after touching widths proofs,
# requantize code, or GEMM dispatch.
fuzz-smoke:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	  $(PY) tools/deep_fuzz.py 200

# The heavy sweep (N=4000, ~15 min) — run before closing a round.
fuzz-full:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	  $(PY) tools/deep_fuzz.py 4000 2>&1 | tee FUZZ_r$(ROUND).txt

# Everything the round's evidence needs: bench artifact + on-chip
# differential + fuzz transcript.
round-evidence: tpu-differential fuzz-full
	$(PY) bench.py --all 2>&1 | tee BENCH_ALL_r$(ROUND).txt

clean:
	rm -f native/libqublas_host.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
