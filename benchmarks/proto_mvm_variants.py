"""Prototype: off-lattice SKI mvm scatter/gather variants on TPU.

The roofline (benchmarks/ski_roofline.py) shows the off-lattice operator
mvm at ~7.0 ms/block vs 0.67 ms for the masked-grid engine: the gap is
the (n*2^d, b) scatter-add + gather of interpolation corners. Candidate
fixes measured here, all exploiting one structural fact: sorting the
POINTS by their lower-corner flat index makes EVERY corner column
idx[:, s] sorted at once (corner s = lower corner + a constant offset),
which unlocks sorted-scatter lowerings and cumsum-based segment sums
with fully static boundary metadata.

Methodology note (this bit burned a previous run): a single dispatch
through the axon tunnel has a ~25 ms RPC floor, so timing one jitted mvm
call per loop iteration drowns a 7 ms kernel in launch overhead. Here
each variant is timed as a CHAIN of `iters` dependent applications
inside ONE jitted program (v <- normalize(mvm(v))), with all large
arrays passed as arguments (closure-captured device arrays become HLO
constants and can miscount).

Throwaway measurement script; kept for provenance of the numbers in
benchmarks/BASELINE_MEASURED.md.
"""

import os
import sys
import time
from functools import partial

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp

from gpim_tpu import utils, skreconstructor
from gpim_tpu.ops import ski

CHAIN = 50


def chain_time(fn, *args, reps=5):
    """Median wall time of one jitted program that applies `fn` CHAIN
    times with a data dependency between applications."""

    @jax.jit
    def prog(v, *rest):
        def body(_, vv):
            out = fn(vv, *rest)
            return out / jnp.maximum(jnp.max(jnp.abs(out)), 1e-30)
        return jax.lax.fori_loop(0, CHAIN, body, v)

    out = prog(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(prog(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) / CHAIN


def build():
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(2)
    shape = (64, 64, 32)
    f = gaussian_filter(rng.randn(*shape), sigma=(4, 4, 2))
    f = (f - f.min()) / (f.max() - f.min())
    R = f + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(0.7 * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    m = skreconstructor(X, R, Xf, kernel="RBF", ski=True, lattice=False,
                        learning_rate=0.1, iterations=0, verbose=0)
    m.run()
    return m._ski_engine


def main():
    eng = build()
    idx = np.asarray(eng._idx)          # (n, S) int32
    wgt = np.asarray(eng._wgt)          # (n, S)
    gshape = eng.grid_shape
    G = int(np.prod(gshape))
    n, S = idx.shape
    b = 9
    print(f"n={n} S={S} G={G} gshape={gshape}", flush=True)

    grids = [jnp.asarray(g) for g in eng.grids_np]
    p = {"lengthscale": jnp.asarray([2.0, 2.0, 2.0]),
         "variance": jnp.asarray(1.0)}
    factors = ski.grid_kernel_factors("RBF", p, grids)
    factors = [jnp.asarray(f, jnp.float32) for f in factors]
    noise = jnp.asarray(0.11)
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(n, b).astype(np.float32))

    wgt = wgt.astype(np.float32)
    idx_j = jnp.asarray(idx)
    wgt_j = jnp.asarray(wgt)

    def report(tag, ms, ref, out):
        err = float(np.max(np.abs(np.asarray(out) - ref))
                    / np.max(np.abs(ref)))
        print(f"{tag:22s}: {ms * 1e3:7.3f} ms  relerr {err:.2e}",
              flush=True)

    # v0: current implementation (flat unsorted scatter)
    def mvm_v0(vv, idx_, wgt_, *fs):
        return ski.ski_mvm(list(fs), idx_, wgt_, noise, gshape, vv)
    t0 = chain_time(mvm_v0, v, idx_j, wgt_j, *factors)
    r0 = np.asarray(mvm_v0(v, idx_j, wgt_j, *factors))
    print(f"{'v0 current':22s}: {t0 * 1e3:7.3f} ms", flush=True)

    # ---- sorted-by-lower-corner world --------------------------------
    perm = np.argsort(idx[:, 0], kind="stable")
    idx_s = idx[perm]
    wgt_s = wgt[perm]
    v_s = jnp.asarray(np.asarray(v)[perm])
    idx_sj = jnp.asarray(idx_s)
    wgt_sj = jnp.asarray(wgt_s)
    r0s = np.asarray(r0)[perm]

    # v1: per-corner scatter/gather with sorted-index hints
    def mvm_v1(vv, idx_, wgt_, *fs):
        contrib = wgt_[:, :, None] * vv[:, None, :]
        u = jnp.zeros((G, b), vv.dtype)
        for s in range(S):
            u = u.at[idx_[:, s]].add(
                contrib[:, s, :], indices_are_sorted=True,
                mode="promise_in_bounds")
        t = ski.kron_mvm(list(fs), u.reshape(gshape + (b,))).reshape(G, b)
        out = jnp.zeros_like(vv)
        for s in range(S):
            out = out + wgt_[:, s, None] * t.at[idx_[:, s]].get(
                indices_are_sorted=True, mode="promise_in_bounds")
        return out + noise * vv
    t1 = chain_time(mvm_v1, v_s, idx_sj, wgt_sj, *factors)
    report("v1 sorted hints", t1, r0s, mvm_v1(v_s, idx_sj, wgt_sj,
                                              *factors))

    # v2: cumsum segment-sum with static boundaries, per corner
    uniq, first = np.unique(idx_s[:, 0], return_index=True)
    last = np.r_[first[1:], n] - 1
    uniq_j = jnp.asarray(uniq.astype(np.int32))
    last_j = jnp.asarray(last.astype(np.int32))
    offs = idx_s[0, :] - idx_s[0, 0]
    assert (idx_s - idx_s[:, :1] == offs[None, :]).all()

    def mvm_v2(vv, idx_, wgt_, uniq_, last_, *fs):
        u = jnp.zeros((G, b), vv.dtype)
        for s in range(S):
            c = jnp.cumsum(wgt_[:, s, None] * vv, axis=0)
            sums = c.at[last_].get(
                indices_are_sorted=True, mode="promise_in_bounds")
            sums = jnp.diff(sums, axis=0,
                            prepend=jnp.zeros((1, b), vv.dtype))
            u = u.at[uniq_ + offs[s]].add(
                sums, indices_are_sorted=True, unique_indices=True,
                mode="promise_in_bounds")
        t = ski.kron_mvm(list(fs), u.reshape(gshape + (b,))).reshape(G, b)
        out = jnp.zeros_like(vv)
        for s in range(S):
            out = out + wgt_[:, s, None] * t.at[idx_[:, s]].get(
                indices_are_sorted=True, mode="promise_in_bounds")
        return out + noise * vv
    t2 = chain_time(mvm_v2, v_s, idx_sj, wgt_sj, uniq_j, last_j, *factors)
    report("v2 cumsum-seg", t2, r0s,
           mvm_v2(v_s, idx_sj, wgt_sj, uniq_j, last_j, *factors))

    # v5: v2 scatter side + unique-row gather distributed by inverse map
    inv = np.searchsorted(uniq, idx_s[:, 0]).astype(np.int32)
    inv_j = jnp.asarray(inv)

    def mvm_v5(vv, idx_, wgt_, uniq_, last_, inv_, *fs):
        u = jnp.zeros((G, b), vv.dtype)
        for s in range(S):
            c = jnp.cumsum(wgt_[:, s, None] * vv, axis=0)
            sums = c.at[last_].get(
                indices_are_sorted=True, mode="promise_in_bounds")
            sums = jnp.diff(sums, axis=0,
                            prepend=jnp.zeros((1, b), vv.dtype))
            u = u.at[uniq_ + offs[s]].add(
                sums, indices_are_sorted=True, unique_indices=True,
                mode="promise_in_bounds")
        t = ski.kron_mvm(list(fs), u.reshape(gshape + (b,))).reshape(G, b)
        out = jnp.zeros_like(vv)
        for s in range(S):
            rows = t.at[uniq_ + offs[s]].get(
                indices_are_sorted=True, unique_indices=True,
                mode="promise_in_bounds")
            out = out + wgt_[:, s, None] * rows.at[inv_].get(
                indices_are_sorted=True, mode="promise_in_bounds")
        return out + noise * vv
    t5 = chain_time(mvm_v5, v_s, idx_sj, wgt_sj, uniq_j, last_j, inv_j,
                    *factors)
    report("v5 cumsum+uniqgather", t5, r0s,
           mvm_v5(v_s, idx_sj, wgt_sj, uniq_j, last_j, inv_j, *factors))

    # v6: NO scatter/gather at all - dense per-dim Khatri-Rao gemms.
    # W's rows factor per dim (wgt[i,s] = prod_k wk[i, bit_k]); densify the
    # per-dim interpolation matrices W_k (n, g_k) (2 nnz/row -> dense) and
    # precompute KR23[i, b*c] = W2[i,b] W3[i,c] ONCE (parameter- and
    # v-independent). Then
    #   W^T V = reshape( (V (x)row W1)^T @ KR23 )        one (pa, i)x(i, bc)
    #   W  T  = einsum("i(bc),(bc)(pa)->i(pa)", KR23, T) one gemm + fold a
    # pure MXU traffic, zero scatter lowering. Memory: KR23 is n*g2*g3
    # floats (~200 MB here) - a size-gated strategy.
    d = len(gshape)
    assert d == 3
    i0 = np.asarray(eng._i0)            # (n, d) lower corners (sorted order)
    w0 = np.asarray(eng._w0)
    maskp = np.asarray(eng._mask, np.float32)
    Wk = []
    for k in range(d):
        Wd = np.zeros((n, gshape[k]), np.float32)
        rows = np.arange(n)
        Wd[rows, i0[:, k]] = w0[:, k]
        Wd[rows, np.minimum(i0[:, k] + 1, gshape[k] - 1)] += 1.0 - w0[:, k]
        if k == 0:
            Wd *= maskp[:, None]        # mask folds into one factor only
        Wk.append(Wd)
    KR23 = (Wk[1][:, :, None] * Wk[2][:, None, :]).reshape(n, -1)
    W1_j = jnp.asarray(Wk[0][perm])
    KR23_j = jnp.asarray(KR23[perm])
    g1 = gshape[0]
    HI = jax.lax.Precision.HIGH

    def mvm_v6(vv, W1_, KR23_, *fs):
        lhs = (vv[:, :, None] * W1_[:, None, :]).reshape(n, -1)  # (n, pa)
        U = jnp.dot(lhs.T, KR23_, precision=HI)                  # (pa, bc)
        U = U.reshape(b, g1, gshape[1], gshape[2])
        T = jax.vmap(lambda t: ski.kron_mvm(list(fs), t))(U)
        T = jnp.moveaxis(T.reshape(b, g1, -1), 0, 1).reshape(g1 * b, -1)
        Y = jnp.dot(KR23_, T.T, precision=HI)                    # (n, a*p)
        Y = Y.reshape(n, g1, b)
        out = jnp.einsum("iap,ia->ip", Y, W1_)
        return out + noise * vv
    t6 = chain_time(mvm_v6, v_s, W1_j, KR23_j, *factors)
    report("v6 dense-KR gemm", t6, r0s, mvm_v6(v_s, W1_j, KR23_j,
                                               *factors))

    # v7: ONE scatter + ONE gather for all 2^d corners. Corner s sits at a
    # constant grid shift from the lower corner, so scatter the whole
    # (n, S*b) weighted block to the LOWER corners once, then realize the
    # corner offsets as d-dim rolls of the grid (cheap elementwise);
    # mirror on the gather side. Rolls never wrap into live data because
    # build_interp clips i0 <= size-2. Physical traffic: one (n, S*b~72
    # -> 128 lanes) scatter instead of 8 lane-padded (n, 9 -> 128) ones.
    idx0_j = jnp.asarray(idx_s[:, 0])
    bits = [[(s >> k) & 1 for k in range(d)] for s in range(S)]

    def mvm_v7(vv, idx0_, wgt_, *fs):
        contrib = (wgt_[:, :, None] * vv[:, None, :]).reshape(n, S * b)
        U0 = jnp.zeros((G, S * b), vv.dtype).at[idx0_].add(
            contrib, indices_are_sorted=True, mode="promise_in_bounds")
        Ug = U0.reshape(gshape + (S, b))
        acc = jnp.zeros(gshape + (b,), vv.dtype)
        for s in range(S):
            acc = acc + jnp.roll(Ug[..., s, :], shift=bits[s],
                                 axis=tuple(range(d)))
        t = ski.kron_mvm(list(fs), acc)
        T = jnp.stack([jnp.roll(t, shift=[-x for x in bits[s]],
                                axis=tuple(range(d)))
                       for s in range(S)], axis=-2)     # gshape + (S, b)
        g = T.reshape(G, S * b).at[idx0_].get(
            indices_are_sorted=True, mode="promise_in_bounds")
        out = jnp.sum(wgt_[:, :, None] * g.reshape(n, S, b), axis=1)
        return out + noise * vv
    t7 = chain_time(mvm_v7, v_s, idx0_j, wgt_sj, *factors)
    report("v7 one-scatter+roll", t7, r0s,
           mvm_v7(v_s, idx0_j, wgt_sj, *factors))


if __name__ == "__main__":
    main()
