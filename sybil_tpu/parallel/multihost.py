"""Multi-host runtime: one query, one mesh, N processes.

The reference's multi-node story is N independent binaries exchanging
gob blobs through an external orchestrator (SURVEY.md §3.4) — the
protocol lives in wire.py/aggregator.py and still works here.  This
module is the TPU-native alternative: `jax.distributed` joins N
processes (hosts of a pod slice, or N local processes in tests) into
ONE device mesh, each process feeds its local shard of every block
batch, and the hash-partitioned all-to-all shuffle (mesh.py) merges
group tables over ICI/DCN instead of host-side gob stitching.  Every
process computes the identical replicated result; process 0 prints.

Wire-up (any node):
    sybil query ... -dist-coordinator host0:1234 -dist-pid K -dist-nproc N

On CPU (tests: N local processes, gloo TCP collectives) the same flags
apply with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.

Design notes:
- Column batches are assembled per process as HOST arrays for the
  process's local span of the global batch, then stitched into global
  arrays with `jax.make_array_from_process_local_data`.  (The
  single-process path keeps per-block lanes resident in HBM instead;
  carrying that cache through global-array assembly is a later
  optimization — multi-host correctness comes first.)
- Replicated scan constants (filter literals, regex bitsets, time
  bucket) are passed as raw numpy: identical on every process, JAX
  treats host values under a replicated in_spec as one global constant.
- Host downloads go through `fetch`, which all-gathers a sharded global
  array into a replicated one before `np.asarray` — only for the rare
  escalation paths; the packed main download is replicated by then.
- Shared or partitioned storage both work: every process scans the
  global block list's local span.  Sample collection re-reads matched
  blocks from disk and therefore needs the block dirs readable on every
  process (true for shared filesystems; the wire protocol covers
  shared-nothing clusters).
"""

from __future__ import annotations

import os

import numpy as np

_INITIALIZED = False


def init_distributed(flags) -> bool:
    """Join the jax.distributed runtime if -dist-coordinator (or the
    SYBIL_DIST_* env vars) are set.  Idempotent; returns True when this
    process is part of a multi-process mesh."""
    global _INITIALIZED
    coord = getattr(flags, "dist_coordinator", "") or \
        os.environ.get("SYBIL_DIST_COORDINATOR", "")
    if not coord:
        return False
    if _INITIALIZED:
        return True

    import jax

    nproc = getattr(flags, "dist_num_processes", 0) or \
        int(os.environ.get("SYBIL_DIST_NPROC", "0"))
    pid = getattr(flags, "dist_process_id", -1)
    if pid < 0:
        pid = int(os.environ.get("SYBIL_DIST_PID", "-1"))
    try:
        # cross-process collectives on the CPU backend need gloo; a no-op
        # for TPU meshes (ICI/DCN collectives are native)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 - older jax without the knob
        pass
    jax.distributed.initialize(coord, num_processes=nproc, process_id=pid)
    _INITIALIZED = True
    return True


def is_multiprocess() -> bool:
    import jax
    try:
        return jax.process_count() > 1
    except Exception:  # noqa: BLE001 - backend not initialized yet
        return False


def process_id() -> int:
    import jax
    return jax.process_index()


def is_printer() -> bool:
    """Only one process talks to stdout (the reference's per-node
    binaries each print; here the result is already merged)."""
    return not is_multiprocess() or process_id() == 0


def global_batch(mesh, local: np.ndarray, axis: str = "d"):
    """Stitch per-process host arrays (the process's local span of
    axis 0) into one global array sharded over the mesh axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis, *([None] * (local.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.ascontiguousarray(local))


def global_batch_device(mesh, local, axis: str = "d"):
    """Local span -> global array sharded over `axis` WITHOUT a host
    round trip: `local` (a jax array already on this process's device,
    or numpy) is split across this process's mesh devices in mesh order
    and stitched with make_array_from_single_device_arrays — pure local
    metadata, no collective, no device->host->device copy.  This is what
    lets the HBM residency cache work in multi-host mode: the per-column
    decode result stays on its device and the assembled global array
    (cached per batch) just references those buffers."""
    import jax

    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis, *([None] * (local.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    nproc = jax.process_count()
    global_shape = (local.shape[0] * nproc,) + tuple(local.shape[1:])
    pid = jax.process_index()
    local_devs = [d for d in mesh.devices.flat
                  if d.process_index == pid]
    nd = len(local_devs)
    if nd == 1:
        shards = [jax.device_put(local, local_devs[0])]
    else:
        per = local.shape[0] // nd
        shards = [jax.device_put(local[i * per: (i + 1) * per], dev)
                  for i, dev in enumerate(local_devs)]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, shards)


def fetch(x, mesh=None) -> np.ndarray:
    """np.asarray for possibly-sharded global arrays: replicate first
    (an all-gather) when this process cannot address every shard."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.sharding import NamedSharding, PartitionSpec as P
        if mesh is None:
            raise ValueError("fetch of a sharded global array needs a mesh")
        x = jax.jit(lambda a: a,
                    out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(x)


def allgather_max(value: int) -> int:
    """Agree on a shared int (e.g. a pad width) across processes."""
    if not is_multiprocess():
        return int(value)
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(
        np.asarray([value], dtype=np.int64))
    return int(np.max(vals))
