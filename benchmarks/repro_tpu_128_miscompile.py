"""
Minimal repro + canary for the TPU-backend 128-multiple miscompile.

Observed (round 3, jax 0.9.x / axon TPU tunnel - see the version stamp the
script prints for the exact environment it was last confirmed on): jitting
``jax.value_and_grad`` of the masked-grid Kronecker MLL
(gpim_tpu/gpreg/mgrid_model.py `_train_seg`) with ANY grid dim a multiple
of 128 corrupts the CG ``while_loop`` output - gradients (and then the
trajectory) go NaN, while the value-only program at the same shapes is
finite and bit-reproducible. 127/129/96/64-sized dims never fail.
``optimization_barrier`` pins on the factor build and the sliced loop
outputs fix reduced repros but NOT the full training program, so
``MaskedGridEngine`` shipped a +4-cell exact padding dodge
(mgrid_model.py `__init__`; exactness proven by
tests/test_ski.py::test_masked_grid_engine_128_padding_exact).

Round 4 measured the bug HEALED on this backend (jax 0.9.0 / TPU v5
lite: rel_param_gap 0.0035 at the trigger shape; the raw 1M program is
healthy and 1.6x faster than its padded twin), so the dodge default is
now OFF - ``pad_dodge=True`` / ``GPIM_TPU_PAD_DODGE=1`` re-enable it,
and MaskedGridEngine.train raises an actionable error if a raw
128-multiple trajectory ever goes non-finite.

This script runs the UNPADDED program (``pad_dodge=False``) at the known
trigger shape and reports:

    HEALED       - finite trajectory, matches the padded twin: the backend
                   bug does not manifest; the retired default is safe.
    STILL-BROKEN - non-finite or divergent trajectory: flip the
                   ``pad_dodge`` default back to True.

Run it on real TPU hardware (under the CPU backend it always reports
HEALED - the bug is TPU-specific). benchmarks/suite.py calls
:func:`run_canary` as a non-fatal row so every benchmarked round records
the current backend status; tests/test_tpu_canary.py wraps it as an
xfail-style test that flips when the backend heals.
"""

import json

import numpy as np


def _build(pad_dodge, dtype=np.float32):
    import jax.numpy as jnp
    from gpim_tpu.gpreg.mgrid_model import MaskedGridEngine
    from gpim_tpu.kernels.transforms import (interval_inverse,
                                             positive_inverse)

    rng = np.random.RandomState(0)
    g1, g2 = 128, 6                      # known trigger: leading dim % 128
    axes = [np.arange(g1, dtype=dtype), np.arange(g2, dtype=dtype)]
    Y = np.sin(axes[0][:, None] / 9.0) + np.cos(axes[1][None, :] / 2.0)
    Y = (Y + 0.03 * rng.randn(g1, g2)).astype(dtype)
    Y[rng.rand(g1, g2) < 0.5] = np.nan
    eng = MaskedGridEngine("RBF", axes, ~np.isnan(Y), Y, dtype,
                           cg_iters=64, precond_rank=128, seed=0,
                           pad_dodge=pad_dodge)
    bounds = {"ls_lo": jnp.zeros(2, dtype), "ls_hi": jnp.full(2, 20.0, dtype)}
    u0 = {"lengthscale": interval_inverse(jnp.full(2, 3.0, dtype),
                                          bounds["ls_lo"], bounds["ls_hi"]),
          "outputscale": positive_inverse(jnp.asarray(1.0, dtype)),
          "noise": positive_inverse(jnp.asarray(0.1, dtype)),
          "mean": jnp.zeros((), dtype)}
    return eng, u0, bounds


def run_canary(iterations=6):
    """Train the unpadded 128-multiple program and the padded twin; return a
    dict with ``healed`` (bool), per-variant finiteness, the loss gap, and
    the jax/backend version stamp."""
    import jax
    import jax.extend  # noqa: F401  (not re-exported by bare `import jax`)

    eng_raw, u0, bounds = _build(pad_dodge=False)
    assert eng_raw._pads == [0, 0] and eng_raw.grid_shape == (128, 6)
    _, traj_raw = eng_raw.train(u0, bounds, 0.1, 1e-6,
                                iterations=iterations)
    eng_pad, u0p, boundsp = _build(pad_dodge=True)
    assert eng_pad._pads == [4, 0]
    _, traj_pad = eng_pad.train(u0p, boundsp, 0.1, 1e-6,
                                iterations=iterations)
    raw_finite = bool(np.isfinite(traj_raw["loss"]).all()
                      and np.isfinite(np.asarray(traj_raw["lengthscale"]))
                      .all())
    pad_finite = bool(np.isfinite(traj_pad["loss"]).all())
    # the twins draw different SLQ probe bases (different G), so their
    # loss VALUES differ by trace-estimator noise (~a few %); the
    # optimized hyperparameters after a few identical-lr steps are the
    # robust healed/broken discriminator (the failure mode is NaN
    # gradients corrupting the trajectory, not a small bias)
    if raw_finite:
        ls_r = np.asarray(traj_raw["lengthscale"])[-1]
        ls_p = np.asarray(traj_pad["lengthscale"])[-1]
        n_r = float(np.asarray(traj_raw["noise"])[-1])
        n_p = float(np.asarray(traj_pad["noise"])[-1])
        gap = float(max(np.max(np.abs(ls_r - ls_p) / (np.abs(ls_p) + 1e-6)),
                        abs(n_r - n_p) / (abs(n_p) + 1e-6)))
        loss_gap = float(np.max(
            np.abs(np.asarray(traj_raw["loss"])
                   - np.asarray(traj_pad["loss"]))
            / (np.abs(np.asarray(traj_pad["loss"])) + 1.0)))
    else:
        gap = loss_gap = float("inf")
    dev = jax.devices()[0]
    return {
        "healed": bool(raw_finite and gap < 0.05),
        "raw_finite": raw_finite,
        "pad_finite": pad_finite,
        "rel_param_gap": gap,
        "rel_loss_gap": loss_gap,
        "platform": dev.platform,
        "device": str(dev.device_kind),
        "jax": jax.__version__,
        "backend": jax.extend.backend.get_backend().platform_version,
    }


if __name__ == "__main__":
    out = run_canary()
    status = "HEALED" if out["healed"] else "STILL-BROKEN"
    if out["platform"] == "cpu":
        status += " (CPU backend - not informative; run on TPU)"
    print(json.dumps(out, indent=2))
    print("128-multiple miscompile status:", status)
    if not out["healed"] and out["platform"] != "cpu":
        print("-> REGRESSION: flip MaskedGridEngine's pad_dodge default "
              "(mgrid_model.py __init__) back to True, or set "
              "GPIM_TPU_PAD_DODGE=1.")
