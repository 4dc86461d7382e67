"""
One process of the multi-process dryrun (see distributed.dryrun_multiprocess).

Usage: python -m gpim_tpu.parallel.mp_worker <scenario> <proc_id> <n_procs>
       <coordinator addr:port> <devices_per_proc> <outdir>

Every process runs the same SPMD program over the global mesh and writes
its fetched results to <outdir>/<scenario>_result_p<proc_id>.npz. Scenarios:

- 'multitask': the task+grid-sharded independent-multitask train/predict
  program (multichip.dryrun on the global mesh, HLO partitioning
  assertions included);
- 'vfe': the public ``reconstructor(..., sparse=True, mesh=True)`` flow -
  data rows shard over the global 'grid' axis (reference ceiling being
  removed: gpr.py:104-113, one CUDA device), with the cross-process VFE
  loss reduction asserted in the compiled HLO.
"""

import os
import sys


def _run_multitask(outdir, pid):
    import numpy as np
    from gpim_tpu.parallel import multichip
    import jax

    loss, mean = multichip.dryrun(len(jax.devices()))
    np.savez(os.path.join(outdir, "multitask_result_p%d.npz" % pid),
             loss=np.asarray(loss), mean=np.asarray(mean))


def _run_vfe(outdir, pid):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gpim_tpu import reconstructor, utils
    from gpim_tpu.parallel import mesh as meshmod
    from gpim_tpu.gpreg import engine

    # deterministic small 2D problem, identical on every process
    rng = np.random.RandomState(0)
    Z = np.exp(-((np.arange(16)[:, None] - 8.0) ** 2
                 + (np.arange(16) - 6.0) ** 2) / 18.0)
    Z = Z + 0.02 * rng.randn(16, 16)
    Z[rng.rand(16, 16) < 0.4] = np.nan
    X = utils.get_sparse_grid(Z)
    X_full = utils.get_full_grid(Z)
    model = reconstructor(X, Z, X_full, kernel="RBF", sparse=True,
                          indpoints=12, iterations=6, verbose=0,
                          mesh=True, precision="double", seed=0)
    mesh = model._mesh
    n_dev = mesh.shape["grid"]
    assert model._Xd.shape[0] % n_dev == 0, (
        "padded row count %d must divide the %d-device mesh"
        % (model._Xd.shape[0], n_dev))
    # the cross-(process|chip) VFE loss reduction must be a real collective
    Xd = meshmod.shard_batch(model._Xd, mesh)
    yd = meshmod.shard_batch(model._yd, mesh)
    maskd = meshmod.shard_batch(model._maskd, mesh)
    u0 = meshmod.replicate(model.u, mesh)
    txt = engine.train.lower(
        u0, Xd, yd, maskd, model._bounds(),
        jnp.asarray(model.learning_rate, model.dtype),
        jnp.asarray(model.jitter, model.dtype),
        kernel="RBF", iterations=2, sparse=True).compile().as_text()
    if n_dev > 1 and "all-reduce" not in txt:
        raise AssertionError(
            "row-sharded VFE train compiled without an all-reduce: the "
            "cross-device B/trace reduction vanished")
    if jax.process_count() > 1:
        assert not Xd.is_fully_addressable, (
            "data rows were expected to span processes")
    model.train()
    mean, sd = model.predict()
    assert np.isfinite(model.losses).all(), model.losses
    assert np.isfinite(mean).all() and np.isfinite(sd).all()
    np.savez(os.path.join(outdir, "vfe_result_p%d.npz" % pid),
             loss=np.asarray(model.losses),
             lengthscale=np.asarray(model.hyperparams["lengthscale"][-1]),
             mean=mean, sd=sd)


def main(argv):
    scenario, pid, n_procs, coord, dev_per_proc, outdir = argv
    pid, n_procs = int(pid), int(n_procs)
    os.makedirs(outdir, exist_ok=True)
    from gpim_tpu.parallel import distributed
    distributed.initialize(coord, n_procs, pid, platform="cpu",
                           virtual_cpu_devices=int(dev_per_proc))
    import jax
    assert jax.process_count() == n_procs
    expected = n_procs * int(dev_per_proc)
    assert len(jax.devices()) == expected, (
        "global device count %d != %d" % (len(jax.devices()), expected))
    if scenario == "multitask":
        _run_multitask(outdir, pid)
    elif scenario == "vfe":
        _run_vfe(outdir, pid)
    else:
        raise SystemExit("unknown scenario %r" % scenario)
    print("mp_worker %s proc %d/%d: OK" % (scenario, pid, n_procs),
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
