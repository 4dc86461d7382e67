"""
Host-transfer helpers for the TPU tunnel.

Every device->host fetch through the axon transport pays a fixed RPC floor
(~25 ms measured) regardless of size, so fetching a K-leaf pytree with K
``np.asarray`` calls costs K floors - at BO-loop rates this dominates the
whole step (measured 101 ms of a 141 ms surrogate retrain was fetching the
4-key trajectory dict). :func:`fetch_tree` packs same-dtype leaves into one
flat device buffer (cheap async device ops) and fetches ONCE.
"""

import numpy as np

__all__ = ["fetch_tree"]


def fetch_tree(tree):
    """np.asarray every leaf of a pytree of device arrays with a single
    device->host transfer when possible.

    Leaves of a common floating dtype are raveled and concatenated on
    device, fetched as one buffer, and re-split on host (bit-exact - no
    math, just layout). Mixed-dtype or non-device trees fall back to
    per-leaf conversion.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if any(isinstance(l, jax.Array) and not l.is_fully_addressable
           for l in leaves):
        # multi-process run (parallel.distributed): process-spanning leaves
        # cannot be exported directly - gather them to every host first.
        # This is a collective path, so fetch_tree must be called by every
        # process on the same tree (SPMD programs do, by construction).
        from gpim_tpu.parallel.distributed import fetch
        return jax.tree_util.tree_unflatten(
            treedef, [fetch(l) if isinstance(l, jax.Array) else np.asarray(l)
                      for l in leaves])
    dev = [isinstance(l, jax.Array) for l in leaves]
    if sum(dev) <= 1 or len({l.dtype for l, d in zip(leaves, dev) if d}) != 1:
        return jax.tree_util.tree_unflatten(
            treedef, [np.asarray(l) for l in leaves])
    flat = jnp.concatenate(
        [jnp.ravel(l) for l, d in zip(leaves, dev) if d])
    # np.array (not asarray): the device export is read-only, and callers
    # (e.g. predict's NaN-row restore) mutate the returned views
    buf = np.array(flat)                        # the one host round trip
    out, off = [], 0
    for l, d in zip(leaves, dev):
        if d:
            n = int(np.prod(l.shape)) if l.ndim else 1
            out.append(buf[off:off + n].reshape(l.shape))
            off += n
        else:
            out.append(np.asarray(l))
    return jax.tree_util.tree_unflatten(treedef, out)
