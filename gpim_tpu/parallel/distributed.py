"""
Multi-process (multi-host) distributed execution.

The reference's ceiling is one CUDA device in one process (reference
gpr.py:104-113,136-140 - ``.cuda()`` transfers only). A TPU pod slice
beyond a single host runs one Python process per host; SURVEY.md section 5
names ``jax.distributed`` as the subsystem to build. The model here is the
standard JAX multi-controller SPMD recipe:

- every process calls :func:`initialize` (one of them is the coordinator),
  after which ``jax.devices()`` is the GLOBAL device list;
- every process executes the SAME program over a global
  ``jax.sharding.Mesh`` built from those devices;
- data placement goes through :func:`put_with` - host arrays become global
  ``jax.Array``s with ``jax.make_array_from_process_local_data`` when the
  sharding spans non-addressable devices (each process contributes the
  shards it owns; with replicated host data every process passes the same
  full array and JAX slices out its part);
- results come back through :func:`fetch`, which allgathers
  process-spanning shards so every process sees the full host value.

XLA compiles the cross-host collectives (the VFE row-reduction psum, the
task-sharded loss all-reduce, prediction gathers) onto ICI/DCN exactly as
it does on a single host; nothing in the model code changes. On CPU (the
test/dryrun backend) the same collectives ride Gloo.

Validation without pod hardware: :func:`dryrun_multiprocess` spawns REAL
separate local processes (localhost coordinator, CPU backend, virtual
devices per process) that jointly train the task-sharded multitask model
and the row-sharded VFE model, then checks cross-process numerics parity
against a single-process run of the same program.
"""

import os
import re
import subprocess
import sys
import tempfile

import numpy as np

__all__ = ["initialize", "is_initialized", "process_index", "process_count",
           "spans_processes", "put_with", "fetch",
           "dryrun_multiprocess"]

_FLAG = "--xla_force_host_platform_device_count"


def _force_virtual_cpu_devices(n):
    """Set (or replace) the virtual-CPU-device-count XLA flag. Must run
    before the CPU backend initializes - backends are lazy, so calling this
    right after ``import jax`` (but before any device use) is safe."""
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"%s=\d+" % _FLAG, "", flags).strip()
    os.environ["XLA_FLAGS"] = ("%s %s=%d" % (flags, _FLAG, int(n))).strip()


def initialize(coordinator_address, num_processes, process_id, *,
               platform=None, virtual_cpu_devices=None):
    """Join (or start, for ``process_id == 0``) a multi-process JAX runtime.

    One call per process, before any computation. After it returns,
    ``jax.devices()`` lists every device in the job and meshes built from
    it span all hosts (``parallel.mesh.get_mesh`` / ``multichip
    .make_mesh_2d`` need no changes - they already build from
    ``jax.devices()``).

    Pod-slice startup (one process per TPU host)::

        from gpim_tpu.parallel import distributed
        distributed.initialize("10.0.0.1:8476", num_processes=4,
                               process_id=int(os.environ["TPU_WORKER_ID"]))
        model = gpim_tpu.reconstructor(X, y, Xtest, mesh=True)  # global mesh

    ``platform`` forces the backend through jax.config (needed in
    environments whose sitecustomize pre-imports jax, where the
    JAX_PLATFORMS env var is read too early); ``virtual_cpu_devices`` gives
    each CPU process that many virtual devices (test/dryrun use).
    """
    import jax
    if virtual_cpu_devices is not None:
        _force_virtual_cpu_devices(virtual_cpu_devices)
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        # cross-process CPU collectives need a real transport
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes), process_id=int(process_id))


def is_initialized():
    import jax
    return jax.distributed.is_initialized()


def process_index():
    import jax
    return jax.process_index()


def process_count():
    import jax
    return jax.process_count()


def spans_processes(mesh):
    """True when a mesh contains devices this process cannot address."""
    import jax
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def put_with(arr, sharding):
    """Place a host array with ``sharding``, multi-process safe.

    Single-process (or fully-addressable) shardings go through plain
    ``jax.device_put``. Process-spanning shardings use
    ``jax.make_array_from_process_local_data`` with the SPMD
    replicated-host-data convention: every process passes the SAME full
    host array (``global_shape == arr.shape``) and contributes only the
    shards it owns - the guard the reconstructors' ``mesh=`` paths rely on
    (a plain device_put to non-addressable devices is a placement error).
    """
    import jax
    if sharding.is_fully_addressable:
        return jax.device_put(arr, sharding)
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        if arr.sharding == sharding:
            return arr                       # already placed as requested
        # reshaping a global array: round-trip through the host replica /
        # an allgather (rare - only between train and predict phases)
        arr = fetch(arr)
    arr = np.asarray(arr)
    return jax.make_array_from_process_local_data(
        sharding, arr, global_shape=arr.shape)


def fetch(garr):
    """The full host value of a (possibly process-spanning) jax.Array,
    identical on every process.

    Fully-addressable arrays are a plain export; fully-replicated global
    arrays read their local replica; sharded global arrays allgather
    (jax.experimental.multihost_utils) - a collective, so every process
    must call fetch on the same arrays in the same order.
    """
    import jax
    # np.array (not asarray): device exports are read-only and callers
    # (e.g. predict's NaN-row restore) mutate the returned value
    if not isinstance(garr, jax.Array) or garr.is_fully_addressable:
        return np.array(garr)
    if garr.is_fully_replicated:
        return np.array(garr.addressable_data(0))
    from jax.experimental import multihost_utils
    return np.array(multihost_utils.process_allgather(garr, tiled=True))


# --------------------------------------------------------------------------
# multi-process dryrun: REAL separate processes on localhost (CPU backend)
# --------------------------------------------------------------------------

def _free_port():
    """A currently-free localhost port. Inherently racy (the probe socket
    must close before the coordinator - a child process - can bind it), so
    callers retry on a bind failure; see _coordinator_bind_failed."""
    import socket
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _coordinator_bind_failed(tails):
    """True when worker logs show the coordinator lost the _free_port race
    (the port was taken between the probe close and the bind)."""
    t = "\n".join(tails).lower()
    return "address already in use" in t or "failed to bind" in t


def _wait_all(procs, timeout):
    """Wait on every worker under ONE shared deadline. On timeout (e.g. a
    peer crashed pre-rendezvous and the rest block in the gloo/coordinator
    handshake forever) kill the stragglers so no orphan outlives the dryrun
    or holds the temp directory/coordinator port."""
    import time
    deadline = time.monotonic() + timeout
    try:
        return [p.wait(timeout=max(0.0, deadline - time.monotonic()))
                for p in procs]
    except Exception:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            try:
                p.wait(timeout=30)
            except Exception:
                pass
        raise


def _worker_env(devices_per_proc):
    env = dict(os.environ)
    flags = re.sub(r"%s=\d+" % _FLAG, "",
                   env.get("XLA_FLAGS", "")).strip()
    env["XLA_FLAGS"] = ("%s %s=%d"
                        % (flags, _FLAG, int(devices_per_proc))).strip()
    # `python -m gpim_tpu...` must resolve this package regardless of the
    # orchestrator's cwd
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = os.pathsep.join(
        [pkg_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    return env


def dryrun_multiprocess(n_procs=2, devices_per_proc=2, timeout=900,
                        scenarios=("multitask", "vfe")):
    """Spawn ``n_procs`` REAL processes (localhost coordinator, CPU backend,
    ``devices_per_proc`` virtual devices each) that jointly run:

    - 'multitask': the task+grid-sharded independent-multitask train step +
      sharded prediction (multichip.dryrun over the global mesh), including
      its compiled-HLO partitioning assertions;
    - 'vfe': the public ``reconstructor(..., sparse=True, mesh=True)``
      train/predict flow with data rows sharded over the global 'grid'
      axis, asserting the cross-process loss reduction in the compiled HLO.

    Every process writes its results to an .npz; this orchestrator then
    runs the SAME scenarios single-process on the same global device count
    and asserts numerics parity (the collectives changed the schedule, not
    the math) and cross-process agreement. Raises on any failure; returns
    the parity report dict.
    """
    out = {}
    with tempfile.TemporaryDirectory(prefix="gpim_mp_") as tmp:
        for scenario in scenarios:
            # multi-process run; retried (fresh port) when the workers lost
            # the _free_port probe-to-bind race to another process
            for attempt in range(3):
                port = _free_port()
                procs, logs = [], []
                try:
                    for pid in range(n_procs):
                        log = open(os.path.join(
                            tmp, "%s_p%d.log" % (scenario, pid)), "w")
                        logs.append(log)
                        procs.append(subprocess.Popen(
                            [sys.executable, "-m",
                             "gpim_tpu.parallel.mp_worker",
                             scenario, str(pid), str(n_procs),
                             "127.0.0.1:%d" % port, str(devices_per_proc),
                             tmp],
                            env=_worker_env(devices_per_proc),
                            stdout=log, stderr=subprocess.STDOUT))
                    rc = _wait_all(procs, timeout)
                finally:
                    for p in procs:
                        if p.poll() is None:
                            p.kill()
                    for log in logs:
                        log.close()
                if not any(rc):
                    break
                tails = []
                for pid in range(n_procs):
                    with open(os.path.join(
                            tmp, "%s_p%d.log" % (scenario, pid))) as f:
                        tails.append("--- proc %d (rc=%d) ---\n%s"
                                     % (pid, rc[pid],
                                        "".join(f.readlines()[-30:])))
                if attempt < 2 and _coordinator_bind_failed(tails):
                    continue
                raise RuntimeError(
                    "multi-process dryrun scenario %r failed (rc=%s)\n%s"
                    % (scenario, rc, "\n".join(tails)))
            # single-process reference on the same global device count
            port = _free_port()
            log_path = os.path.join(tmp, "%s_ref.log" % scenario)
            with open(log_path, "w") as log:
                ref = subprocess.run(
                    [sys.executable, "-m", "gpim_tpu.parallel.mp_worker",
                     scenario, "0", "1", "127.0.0.1:%d" % port,
                     str(n_procs * devices_per_proc), tmp + "/ref"],
                    env=_worker_env(n_procs * devices_per_proc),
                    stdout=log, stderr=subprocess.STDOUT, timeout=timeout)
            if ref.returncode:
                with open(log_path) as f:
                    tail = "".join(f.readlines()[-30:])
                raise RuntimeError(
                    "single-process reference for %r failed (rc=%d)\n%s"
                    % (scenario, ref.returncode, tail))
            results = [np.load(os.path.join(
                tmp, "%s_result_p%d.npz" % (scenario, pid)))
                for pid in range(n_procs)]
            ref_res = np.load(os.path.join(
                tmp + "/ref", "%s_result_p0.npz" % scenario))
            report = {}
            for key in ref_res.files:
                for pid in range(1, n_procs):
                    np.testing.assert_allclose(
                        results[pid][key], results[0][key],
                        rtol=1e-6, atol=1e-8, err_msg=(
                            "%s/%s differs between processes 0 and %d"
                            % (scenario, key, pid)))
                # collectives reorder reductions vs the one-process
                # schedule: parity is close, not bitwise
                np.testing.assert_allclose(
                    results[0][key], ref_res[key], rtol=5e-4, atol=1e-6,
                    err_msg=("%s/%s: multi-process result diverged from "
                             "the single-process run" % (scenario, key)))
                report[key] = float(np.max(np.abs(
                    np.asarray(results[0][key], dtype=np.float64)
                    - np.asarray(ref_res[key], dtype=np.float64))))
            out[scenario] = report
    return out
