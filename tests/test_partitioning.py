"""
Partitioning assertions (VERDICT r3 weak #7): the multichip tests in
test_parallel.py pin sharded == unsharded NUMERICS, which a regression
that silently replicates everything would still pass. These tests inspect
the COMPILED programs instead: expected collectives in the optimized HLO
(`jit(...).lower(...).compile().as_text()`), input placement specs, and
output shardings - a layout regression cannot pass both.

What each program must show:
- VFE train, data rows sharded over 'grid': the (m, m) B / trace
  reductions contract over the sharded row axis -> all-reduce;
- masked-grid (mgrid) CG train under a mesh: the G-sized CG state is
  sharded, every CG iteration's contraction reduces across chips ->
  all-reduce inside the program;
- independent multitask train, channels sharded over 'task': the joint
  scalar loss sums across task shards -> all-reduce;
- correlated multitask train: the T decoupled rotated systems shard over
  'task' via with_sharding_constraint -> collectives present;
- sharded predictions (exact / mgrid grid-path): either the output stays
  row-sharded or the program gathers it (all-gather); a fully-replicated
  output WITH no collective means the sharding silently vanished.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gpim_tpu import utils as gprutils
from gpim_tpu.gpreg import engine
from gpim_tpu.parallel import mesh as meshmod
from gpim_tpu.parallel import multichip

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "all-to-all", "collective-permute")

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device CPU mesh")


def _compiled_text(jitfn, *args, **kwargs):
    return jitfn.lower(*args, **kwargs).compile().as_text()


def _has_collective(txt):
    return any(c in txt for c in COLLECTIVES)


def _toy_grid(n=12, missing=40, seed=3):
    rng = np.random.RandomState(seed)
    R = np.exp(-((np.arange(n)[:, None] - n / 2) ** 2
                 + (np.arange(n)[None, :] - n / 2) ** 2) / 18.0)
    Rn = R.copy()
    Rn.ravel()[rng.choice(n * n, missing, replace=False)] = np.nan
    return Rn


def test_vfe_train_row_sharded_has_allreduce():
    """Row-sharded VFE training must reduce the (m, m) statistics across
    chips - the compiled program contains an all-reduce, and the input
    rows are genuinely placed sharded (gpr.train's device_put path)."""
    from gpim_tpu import reconstructor
    Rn = _toy_grid()
    X = gprutils.get_sparse_grid(Rn)
    Xf = gprutils.get_full_grid(Rn)
    m = reconstructor(X, Rn, Xf, sparse=True, indpoints=16,
                      iterations=2, verbose=0, mesh=8)
    Xd = meshmod.shard_batch(m._Xd, m._mesh)
    yd = meshmod.shard_batch(m._yd, m._mesh)
    maskd = meshmod.shard_batch(m._maskd, m._mesh)
    u0 = meshmod.replicate(m.u, m._mesh)
    assert Xd.sharding.spec == P("grid")
    assert Xd.addressable_shards[0].data.shape[0] == Xd.shape[0] // 8
    txt = _compiled_text(
        engine.train, u0, Xd, yd, maskd, m._bounds(),
        jnp.asarray(0.05, m.dtype), jnp.asarray(1e-6, m.dtype),
        kernel="RBF", iterations=2, sparse=True)
    assert "all-reduce" in txt, "row-sharded VFE train lost its reduction"


def test_mgrid_train_sharded_has_allreduce():
    """The masked-grid CG train step under a mesh shards the G-sized CG
    state over 'grid' (ski._grid_sharder constraints); the per-iteration
    contraction must show up as an all-reduce in the compiled program."""
    from gpim_tpu.gpreg import mgrid_model as mm
    from gpim_tpu.kernels.transforms import positive_inverse, \
        interval_inverse
    import optax

    rng = np.random.RandomState(0)
    g1, g2 = 16, 16                      # G = 256, divisible by 8
    axes = [np.arange(g1, dtype=np.float64),
            np.arange(g2, dtype=np.float64)]
    Y = rng.randn(g1, g2)
    Y[rng.rand(g1, g2) < 0.4] = np.nan
    mesh = meshmod.get_mesh(8)
    eng = mm.MaskedGridEngine("RBF", axes, ~np.isnan(Y), Y, np.float64,
                              cg_iters=16, precond_rank=32, seed=0,
                              mesh=mesh)
    bounds = {"ls_lo": jnp.zeros(2), "ls_hi": jnp.full(2, 10.0)}
    u0 = {"lengthscale": interval_inverse(jnp.full(2, 2.0),
                                          bounds["ls_lo"],
                                          bounds["ls_hi"]),
          "outputscale": positive_inverse(jnp.asarray(1.0)),
          "noise": positive_inverse(jnp.asarray(0.1)),
          "mean": jnp.zeros(())}
    Qp, lam_n = mm._build_precond(u0, eng._axes, eng._mask, bounds,
                                  kernel="RBF", grid_shape=eng.grid_shape,
                                  rank=eng.precond_rank)
    opt_state = optax.adam(1.0).init(u0)
    txt = _compiled_text(
        mm._train_seg, u0, opt_state, Qp, lam_n, eng._axes, eng._mask,
        eng._g0, eng._y, bounds, 0.1, 1e-6, kernel="RBF",
        grid_shape=eng.grid_shape, cg_iters=eng.cg_iters, iterations=2,
        mesh=mesh)
    assert "all-reduce" in txt, \
        "sharded mgrid CG train compiled without cross-chip reductions"

    # ... and the sharded predict program must not silently replicate:
    # either collectives appear or the output stays sharded
    t_axes = tuple(jnp.asarray(a) for a in eng.axes_np)
    lowered = mm._predict_grid.lower(
        u0, eng._axes, eng._mask, eng._y, t_axes, bounds, 1e-6,
        kernel="RBF", grid_shape=eng.grid_shape, cg_iters=eng.cg_iters,
        precond_rank=eng.precond_rank, mesh=mesh)
    ptxt = lowered.compile().as_text()
    assert _has_collective(ptxt) or "sharding=" in ptxt, \
        "sharded mgrid predict compiled with no partitioning at all"


def test_independent_multitask_task_sharded_has_allreduce():
    """Task-sharded joint training: per-chip channel slices, loss summed
    with a psum -> all-reduce in the compiled program; the channel inputs
    are genuinely placed task-sharded."""
    from gpim_tpu.gpreg import multi
    from gpim_tpu.kernels.transforms import positive_inverse

    mesh = multichip.make_mesh_2d(8)
    T, n, d = 8, 64, 2
    rng = np.random.RandomState(0)
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
        assert Y_sh.sharding.spec == P(None, "task")
        assert u_sh["noise"].sharding.spec == P("task")
        txt = _compiled_text(
            multi.train_independent, u_sh, X_sh, Y_sh, mask_sh, bounds,
            jnp.asarray(0.05, dtype), jnp.asarray(1e-4, dtype),
            kernel="RBF", iterations=2)
    assert "all-reduce" in txt, \
        "task-sharded multitask train lost its loss reduction"


def test_correlated_multitask_task_sharded_partitions():
    """Correlated vreconstructor: the T decoupled rotated systems shard
    over 'task' via with_sharding_constraint inside the program - the
    compiled train step must contain collectives (scatter/gather of the
    replicated inputs to task shards at minimum)."""
    from gpim_tpu import vreconstructor
    from gpim_tpu.gpreg import multi

    Rn = _toy_grid()
    T = 4
    Yt = np.stack([Rn * (1 + 0.1 * t) for t in range(T)], -1)
    Xg = gprutils.get_full_grid(Yt[..., 0]).copy()
    Xg[:, np.isnan(Yt[..., 0])] = np.nan
    vr = vreconstructor(Xg, Yt, gprutils.get_full_grid(Yt[..., 0]),
                        kernel="RBF", independent=False, iterations=2,
                        verbose=0, mesh=8)
    assert vr._mesh is not None
    with vr._mesh:
        txt = _compiled_text(
            multi.train_correlated, vr.u, vr._Xd, vr._Yd, vr._bounds(),
            jnp.asarray(0.05, vr.dtype), jnp.asarray(1e-6, vr.dtype),
            kernel="RBF", iterations=2, mesh=vr._mesh)
    assert _has_collective(txt) or "sharding=" in txt, \
        "correlated train compiled with no partitioning"


def test_exact_predict_sharded_rows_not_silently_replicated():
    """'grid'-sharded prediction tiles: the inputs must be placed sharded,
    and the program must either keep the output sharded or gather it -
    fully-replicated output with no collective means the layout was lost."""
    from gpim_tpu import reconstructor
    Rn = _toy_grid()
    X = gprutils.get_sparse_grid(Rn)
    Xf = gprutils.get_full_grid(Rn)
    m = reconstructor(X, Rn, Xf, iterations=2, verbose=0, mesh=8)
    Xtc = np.nan_to_num(m.Xtest)
    chunks, n_test = engine.chunk_rows(Xtc, 16)
    chunks_d = meshmod.shard_chunk_rows(jnp.asarray(chunks), m._mesh)
    assert chunks_d.sharding.spec[1] == "grid"
    u, Xd, yd, maskd = meshmod.replicate(
        (m.u, m._Xd, m._yd, m._maskd), m._mesh)
    txt = _compiled_text(
        engine.predict_exact, u, Xd, yd, maskd, m._bounds(),
        jnp.asarray(1e-6, m.dtype), chunks_d, kernel="RBF",
        noiseless=False)
    mean, var = engine.predict_exact(
        u, Xd, yd, maskd, m._bounds(), jnp.asarray(1e-6, m.dtype),
        chunks_d, kernel="RBF", noiseless=False)
    replicated = mean.sharding.is_fully_replicated
    assert (not replicated) or _has_collective(txt), \
        "sharded exact predict silently replicated its computation"


def test_task_sharded_at_T64():
    """The bench_eels64_parallel shape class (T = 64 channels) through the
    task-sharded joint train program: channels divide the task axis, the
    loss reduction is a real collective, and the updated per-task
    parameters come back task-sharded (small n keeps the CPU cost down -
    the TASK axis is what this pins)."""
    from gpim_tpu.gpreg import multi
    from gpim_tpu.kernels.transforms import positive_inverse

    mesh = multichip.make_mesh_2d(8)
    T, n, d = 64, 128, 2
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
        txt = _compiled_text(
            multi.train_independent, u_sh, X_sh, Y_sh, mask_sh, bounds,
            jnp.asarray(0.05, dtype), jnp.asarray(1e-4, dtype),
            kernel="RBF", iterations=2)
        u_out, traj = multi.train_independent(
            u_sh, X_sh, Y_sh, mask_sh, bounds,
            jnp.asarray(0.05, dtype), jnp.asarray(1e-4, dtype),
            kernel="RBF", iterations=2)
    assert "all-reduce" in txt
    assert np.isfinite(np.asarray(traj["loss"])).all()
    assert not u_out["noise"].sharding.is_fully_replicated, \
        "T=64 per-task parameters came back replicated"


def test_dryrun_partition_probe():
    """The same probe dryrun_multichip now runs: predict_sharded's
    underlying program on its actual sharded inputs must show partitioned
    execution (sharded output or collectives)."""
    ok = multichip.assert_partitioned_predict(multichip.make_mesh_2d(8))
    assert ok


def test_per_device_memory_shrinks_with_mesh():
    """What n chips buys (VERDICT r4 next #3): the compiled SPMD programs
    must show per-device memory that SHRINKS with the mesh, not just
    collectives. memory_analysis() reports per-device sizes; at 8 devices
    the task-sharded multitask step and the 'grid'-sharded mgrid segment
    must both cut their per-device argument footprint by >= 3x and temp
    by >= 2x vs the 1-device compile (reduced shapes here; the 1M-shape
    numbers live in benchmarks/BASELINE_MEASURED.md via
    benchmarks/multichip_memory.py)."""
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__),
                                      "..", "benchmarks"))
    from multichip_memory import (mgrid_train_memory,
                                  multitask_train_memory)

    # n=2112: per-task (n, n) solves dominate temp, so sharding is visible
    # (at small n fixed task-independent buffers mask the ratio)
    mt1 = multitask_train_memory(1, T=64, n=2112)
    mt8 = multitask_train_memory(8, T=64, n=2112)
    assert mt8["collectives"].get("all-reduce", 0) >= 1
    assert mt8["argument_size_in_bytes"] * 3 <= mt1["argument_size_in_bytes"]
    assert mt8["temp_size_in_bytes"] * 2 <= mt1["temp_size_in_bytes"]

    mg1 = mgrid_train_memory(1, shape=(32, 32, 16), precond_rank=128)
    mg8 = mgrid_train_memory(8, shape=(32, 32, 16), precond_rank=128)
    assert sum(mg8["collectives"].values()) >= 1
    assert mg8["argument_size_in_bytes"] * 3 <= mg1["argument_size_in_bytes"]
    assert mg8["temp_size_in_bytes"] * 2 <= mg1["temp_size_in_bytes"]


def test_sharded_kron_mvm_no_full_gather():
    """The explicit shard_map mode-product mvm (ski.kron_mvm_bf_sharded)
    must (1) match the GSPMD form bit-for-bit-ish in f64, (2) differentiate
    identically, and (3) compile with all-to-alls and WITHOUT any full-G
    all-gather - shard-sized intermediates are its whole point (the 1M
    f64 segment's per-device temp dropped 285 -> 142 MB when it replaced
    the GSPMD contraction; benchmarks/MULTICHIP_MEMORY.json)."""
    from gpim_tpu.ops import ski

    shape = (16, 24, 8)
    G = int(np.prod(shape))
    rng = np.random.RandomState(0)
    mask = jnp.asarray((rng.rand(G) > 0.5).astype(np.float64))
    v = rng.randn(5, G)
    grids = [jnp.arange(s, dtype=jnp.float64) for s in shape]
    p = {"lengthscale": jnp.asarray([3.0, 3.0, 2.0]),
         "variance": jnp.asarray(1.3)}
    noise = jnp.asarray(0.1)
    mesh = meshmod.get_mesh(8)
    assert ski.kron_shardable(shape, mesh)
    # too-coarse grids refuse (16 % 8 == 0 but 4 % 8 != 0 on dim 2)
    assert not ski.kron_shardable((16, 4, 8), mesh)
    assert not ski.kron_shardable(shape, None)

    mvm0 = ski.make_masked_grid_mvm("RBF", grids, shape, mask,
                                    batch_first=True)
    mvm1 = ski.make_masked_grid_mvm("RBF", grids, shape, mask,
                                    batch_first=True, mesh=mesh)
    vd = jax.device_put(v, NamedSharding(mesh, P(None, "grid")))
    r0 = jax.jit(lambda v: mvm0(p, noise, v))(v)
    r1 = jax.jit(lambda v: mvm1(p, noise, v))(vd)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               rtol=1e-12, atol=1e-12)

    def loss(mvm, vv):
        def f(ls):
            return jnp.sum(mvm(dict(p, lengthscale=ls), noise, vv) ** 2)
        return f

    g0 = jax.jit(jax.grad(loss(mvm0, v)))(p["lengthscale"])
    g1 = jax.jit(jax.grad(loss(mvm1, vd)))(p["lengthscale"])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-12)

    txt = _compiled_text(jax.jit(lambda v: mvm1(p, noise, v)), vd)
    assert "all-to-all" in txt, "shard_map mvm lost its all-to-alls"
    assert "all-gather" not in txt, \
        "sharded kron mvm still all-gathers a full-G block"
