"""
Canary for the TPU-backend 128-multiple miscompile (VERDICT r3 item 4).

MaskedGridEngine shipped a +4-cell exact padding dodge for a TPU-backend
bug: value_and_grad of the masked-grid MLL corrupted the CG while_loop
output when any grid dim was a multiple of 128. Round 4 measured the bug
HEALED (jax 0.9.0 / TPU v5 lite - rel_param_gap 0.0035 at the trigger
shape, raw 1M program healthy and 1.6x faster than padded), so the dodge
is now OFF by default (mgrid_model.py __init__; pad_dodge=True /
GPIM_TPU_PAD_DODGE=1 re-enables it). This canary now guards the
RETIREMENT. It runs the unpadded program at the trigger shape via
benchmarks/repro_tpu_128_miscompile.py and:

- on CPU (the suite's forced platform): asserts the program is healthy -
  the bug was TPU-specific, so a CPU failure would mean a REAL regression
  in the engine itself, not the backend;
- on TPU: asserts the backend is still healed - a failure means the
  miscompile is back and the default must flip to padded again.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def _canary():
    from benchmarks.repro_tpu_128_miscompile import run_canary
    return run_canary(iterations=4)


def test_unpadded_128_program_on_cpu():
    """CPU backend: the unpadded 128-multiple program must be healthy
    (finite and matching its padded twin) - this pins that the padding
    dodge is the ONLY thing standing between the engine and the raw
    shape, i.e. the engine math itself is shape-agnostic."""
    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend variant; TPU runs the xfail canary below")
    out = _canary()
    assert out["raw_finite"] and out["pad_finite"], out
    assert out["rel_param_gap"] < 0.05, out


def test_unpadded_128_program_on_tpu():
    """TPU backend: the miscompile healed (round 4) and the padding dodge
    default retired with it - this asserts the backend STAYS healed. A
    failure here means the 128-multiple value_and_grad bug is back on this
    backend: flip MaskedGridEngine's pad_dodge default to True (or set
    GPIM_TPU_PAD_DODGE=1) and re-xfail this test."""
    if jax.default_backend() == "cpu":
        pytest.skip("needs real TPU hardware (bug was TPU-specific)")
    out = _canary()
    assert out["healed"], out
