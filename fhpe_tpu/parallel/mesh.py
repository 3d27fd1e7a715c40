"""Device-mesh helpers for SPMD data parallelism.

The reference's only parallelism is single-process ``nn.DataParallel``
scatter/gather (tools/train.py:142; SURVEY.md section 2.3).  Here the
equivalent is a 1-D ``jax.sharding.Mesh`` over all chips with the global
batch sharded on the ``data`` axis; gradients are averaged with an on-ICI
``pmean`` inside ``shard_map`` (see train/step.py).

Multi-host (DCN) training uses the same mesh over the GLOBAL device list:
call ``initialize_multihost()`` first, give every process the same loader
seed (each yields its process's slice of every global batch — see
``data/loader.py``), and ``shard_batch`` assembles the global array from
process-local data.  The ``pmean`` then rides ICI within a slice and DCN
across hosts, inserted by XLA from the same program.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """``jax.distributed.initialize`` wrapper (no-op if already inited or
    single-process env).  On TPU pods the arguments auto-detect."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def get_mesh(num_devices: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def get_local_mesh() -> Mesh:
    """Mesh over this process's addressable devices only (single-host eval
    in a multi-host job: validation needs no cross-host collectives)."""
    return Mesh(np.array(jax.local_devices()), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, sharded on the leading axis.

    Single-process: a plain async ``device_put``.  Multi-process (a mesh
    spanning hosts): ``batch`` holds this process's contiguous slice of
    the global batch (the loader's per-process sharding) and the global
    array is assembled with ``make_array_from_process_local_data``.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1 and any(
            d.process_index != jax.process_index() for d in
            mesh.devices.flat):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2, keys=None,
                       transform=None):
    """Wrap a host-batch iterator, keeping ``size`` batches in flight on
    device (sharded on the data axis).  jax.device_put is async, so the
    H2D copy of batch N+1 overlaps the compute of batch N — the TPU-side
    equivalent of the reference DataLoader's pinned-memory prefetch
    (tools/train.py:168-181).  Yields (device_batch, host_batch) pairs so
    callers keep access to host-only fields (paths, centers, valid masks).
    """
    import collections

    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            host = next(iterator, None)
            if host is None:
                return
            if transform is not None:
                dev = transform(host)
            else:
                dev = {k: v for k, v in host.items()
                       if (keys is None or k in keys)
                       and isinstance(v, np.ndarray) and v.dtype != object}
            queue.append((shard_batch(mesh, dev), host))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
