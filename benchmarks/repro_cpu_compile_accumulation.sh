#!/bin/sh
# Repro for the XLA:CPU compile-accumulation SIGSEGV (round-3 VERDICT
# weak #1 / round-4 item 1).
#
# Symptom: the full test suite reproducibly dies with exit 139 inside
# backend_compile_and_load while compiling the Matern52 masked-grid
# predict program (tests/test_ski.py::test_masked_grid_engine_
# nonrbf_kernels), after ~157 green tests. Environment where observed:
# jax 0.9.0, XLA:CPU (forced via jax.config), 8 virtual host devices,
# python 3.12 (see tests/conftest.py docstring for the fix).
#
# Evidence that it is an ACCUMULATION threshold, not file interplay
# (round-4 bisection, logs in ROUND4_NOTES.md):
#   - first  half of preceding test files + test_ski.py ->  85 passed, 0
#   - second half of preceding test files + test_ski.py -> 101 passed, 0
#   - union (the full suite)                             -> SIGSEGV 139
# Only the combined volume of live compiled executables differs between
# the passing halves and the crashing union.
#
# To REPRODUCE the crash, run the suite with the mitigation disabled
# (the autouse fixture in tests/conftest.py releases compiled programs
# between test files; GPIM_TPU_KEEP_COMPILED=1 turns that off):
#
#   GPIM_TPU_KEEP_COMPILED=1 \
#   XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#   JAX_PLATFORMS=cpu python -m pytest tests/ -q
#
# Expected: exit 139 at test_ski.py::test_masked_grid_engine_nonrbf_
# kernels (takes ~25 min; deterministic, observed 3/3 runs across two
# rounds). With the fixture active (default), the same command exits 0.
cd "$(dirname "$0")/.." || exit 1
GPIM_TPU_KEEP_COMPILED=1 \
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
JAX_PLATFORMS=cpu python -m pytest tests/ -q
echo "exit code: $?"
