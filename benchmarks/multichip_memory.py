"""
What n chips buys: per-device memory scaling of the big sharded programs
(VERDICT r4 next #3).

Real multi-chip hardware is unavailable, but the compiled SPMD program is
authoritative about per-device memory: XLA's ``memory_analysis()`` on a
lowered+compiled sharded program reports PER-DEVICE argument/temp sizes
(compile-only - nothing executes). This module lowers

- the 'grid'-sharded masked-grid (mgrid) 1M-cell training segment, and
- the 'task'-sharded T=64 independent-multitask training step

on 1-device and n-device CPU meshes and reports the footprint ratios and
the collective ops the partitioner inserted. The test in
tests/test_partitioning.py gates the same functions at reduced shapes;
the full-shape numbers live in benchmarks/BASELINE_MEASURED.md ("what n
chips buys").

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python benchmarks/multichip_memory.py
"""

import json
import os
import re
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

if __name__ == "__main__":
    # per-device memory analysis needs a multi-device mesh: force the
    # virtual CPU backend (the container's sitecustomize pre-imports jax,
    # so only a config update reliably overrides the axon platform - same
    # mechanism as tests/conftest.py)
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

_COLL_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|all-to-all|"
    r"collective-permute)(?:-start)?\(")


def _mem_fields(compiled):
    ma = compiled.memory_analysis()
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "peak_memory_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    return out


def _collective_counts(txt):
    counts = {}
    for m in _COLL_RE.finditer(txt):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def mgrid_train_memory(n_dev, shape=(128, 128, 64), cg_iters=64,
                       precond_rank=1024, iterations=2):
    """Per-device memory of the 'grid'-sharded masked-grid training segment
    (mgrid_model._train_seg) on an ``n_dev``-device mesh. Compile-only."""
    import jax.numpy as jnp
    import optax
    from gpim_tpu.gpreg import mgrid_model as mm
    from gpim_tpu.parallel import mesh as meshmod
    from gpim_tpu.kernels.transforms import positive_inverse, \
        interval_inverse

    rng = np.random.RandomState(0)
    axes = [np.arange(s, dtype=np.float64) for s in shape]
    Y = rng.randn(*shape)
    flat = Y.reshape(-1, shape[-1])
    sites = rng.choice(len(flat), int(0.7 * len(flat)), replace=False)
    flat[sites] = np.nan
    mesh = meshmod.get_mesh(n_dev) if n_dev > 1 else None
    eng = mm.MaskedGridEngine("RBF", axes, ~np.isnan(Y), Y, np.float64,
                              cg_iters=cg_iters, precond_rank=precond_rank,
                              seed=0, mesh=mesh)
    d = len(shape)
    bounds = {"ls_lo": jnp.zeros(d), "ls_hi": jnp.full(d, 50.0)}
    u0 = {"lengthscale": interval_inverse(jnp.full(d, 5.0),
                                          bounds["ls_lo"],
                                          bounds["ls_hi"]),
          "outputscale": positive_inverse(jnp.asarray(1.0)),
          "noise": positive_inverse(jnp.asarray(0.1)),
          "mean": jnp.zeros(())}
    Qp, lam_n = mm._build_precond(u0, eng._axes, eng._mask, bounds,
                                  kernel="RBF", grid_shape=eng.grid_shape,
                                  rank=eng.precond_rank)
    opt_state = optax.adam(1.0).init(u0)
    compiled = mm._train_seg.lower(
        u0, opt_state, Qp, lam_n, eng._axes, eng._mask, eng._g0, eng._y,
        bounds, 0.1, 1e-6, kernel="RBF", grid_shape=eng.grid_shape,
        cg_iters=eng.cg_iters, iterations=iterations,
        mesh=mesh).compile()
    rec = {"program": "mgrid_train_seg", "n_dev": n_dev,
           "shape": list(shape), "G": int(np.prod(shape))}
    rec.update(_mem_fields(compiled))
    rec["collectives"] = _collective_counts(compiled.as_text())
    return rec


def multitask_train_memory(n_dev, T=64, n=2112, d=2, iterations=2):
    """Per-device memory of the 'task'-sharded independent-multitask joint
    training step on an (n_dev, 1) task mesh. Compile-only."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from gpim_tpu.gpreg import multi
    from gpim_tpu.parallel import multichip
    from gpim_tpu.kernels.transforms import positive_inverse

    devs = np.asarray(jax.devices()[:n_dev]).reshape(n_dev, 1)
    mesh = Mesh(devs, ("task", "grid"))
    rng = np.random.RandomState(1)
    dtype = jnp.float32
    X = jnp.asarray(rng.rand(n, d), dtype)
    Y = jnp.asarray(rng.rand(n, T), dtype)
    mask = jnp.ones((n,), dtype)
    bounds = {"ls_lo": jnp.zeros((d,), dtype),
              "ls_hi": jnp.full((d,), 4.0, dtype)}
    one = jnp.asarray(1.0, dtype)
    u = {"lengthscale": jnp.zeros((T, d), dtype),
         "outputscale": jnp.full((T,), positive_inverse(one)),
         "noise": jnp.full((T,), positive_inverse(one)),
         "mean": jnp.zeros((T,), dtype)}
    with mesh:
        u_sh, X_sh, Y_sh, mask_sh = multichip.shard_multitask(
            u, X, Y, mask, mesh)
        compiled = multi.train_independent.lower(
            u_sh, X_sh, Y_sh, mask_sh, bounds,
            jnp.asarray(0.05, dtype), jnp.asarray(1e-4, dtype),
            kernel="RBF", iterations=iterations).compile()
    rec = {"program": "multitask_train_independent", "n_dev": n_dev,
           "T": T, "n": n}
    rec.update(_mem_fields(compiled))
    rec["collectives"] = _collective_counts(compiled.as_text())
    return rec


def scaling_report(n_dev=8, mgrid_shape=(128, 128, 64),
                   T=64, n=2112):
    """Lower both programs at 1 and ``n_dev`` devices; return the records
    plus per-device footprint ratios (temp + argument)."""
    rows = [mgrid_train_memory(1, shape=mgrid_shape),
            mgrid_train_memory(n_dev, shape=mgrid_shape),
            multitask_train_memory(1, T=T, n=n),
            multitask_train_memory(n_dev, T=T, n=n)]
    report = {"n_dev": n_dev, "rows": rows}
    for a, b, name in ((rows[0], rows[1], "mgrid"),
                       (rows[2], rows[3], "multitask")):
        for k in ("temp_size_in_bytes", "argument_size_in_bytes"):
            if a.get(k) and b.get(k) is not None:
                report["%s_%s_ratio" % (name, k.split("_")[0])] = round(
                    b[k] / max(a[k], 1), 4)
    return report


def main():
    report = scaling_report()
    print(json.dumps(report, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "MULTICHIP_MEMORY.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
