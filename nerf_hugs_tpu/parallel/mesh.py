"""Device mesh and sharding helpers.

One 1-D ('data',) mesh over all chips: rays/batches shard along it, params
replicate. Gradients all-reduce over ICI because jit sees replicated params
with sharded inputs — no explicit pmean needed (this replaces the reference's
pmap/pmean, train_utils.py:457-484, with the XLA-native SPMD path).
Multi-host: call jax.distributed.initialize() before make_mesh(); the mesh
spans all processes' devices and batch sharding rides DCN across hosts.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed for multi-host meshes when the environment
    provides coordination info (NERF_HUGS_MULTIHOST=1 forces it; standard
    JAX/TPU env vars are auto-detected by jax.distributed.initialize).

    MUST run before any JAX API that touches devices (jax.devices,
    jax.device_count, jax.process_count, ...): those initialize the local
    backend, after which jax.distributed.initialize() fails and the run
    silently degrades to independent single-host processes. The decision is
    therefore made from env vars alone — replaces the reference's implicit
    multi-host pmap setup (SURVEY.md §2.h)."""
    import os
    want = (os.environ.get("NERF_HUGS_MULTIHOST") == "1"
            or "JAX_COORDINATOR_ADDRESS" in os.environ
            or "COORDINATOR_ADDRESS" in os.environ)
    if not want:
        return
    # Explicit env-var topology (generic launchers); jax's no-arg
    # auto-detect only covers known clusters (TPU pods, SLURM, ...).
    kwargs = {}
    coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if coord and nproc is not None and pid is not None:
        kwargs = dict(coordinator_address=coord,
                      num_processes=int(nproc), process_id=int(pid))
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # already initialized or no coordinator
        print(f"jax.distributed.initialize skipped: {e}")


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis sharding for ray batches."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device_put a host batch with its leading axis split over the mesh.

    Multi-host: datasets emit PER-HOST batches (batch_size/process_count,
    data/base.py), so each host's array is its process-local shard of the
    global batch — assembled with make_array_from_process_local_data
    (plain device_put would mistake it for the global value)."""
    sharding = data_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2,
                       axis_name: str = "data"):
    """Yield sharded batches `size` steps ahead of consumption.

    device_put is asynchronous, so sharding the next batch while the current
    train step runs overlaps H2D transfer with compute — the SPMD
    counterpart of the reference's flax.jax_utils.prefetch_to_device
    (MipNeRF360/train.py:127, queue depth 3 there; the host-side dataset
    thread already buffers, so 2 device-side slots suffice)."""
    import collections
    import itertools

    import os
    # A/B toggle: NERF_HUGS_PREFETCH=0 degrades to synchronous per-step
    # sharding (the round-2 behavior) for measuring the overlap win.
    if os.environ.get("NERF_HUGS_PREFETCH") == "0":
        size = 0

    queue = collections.deque()

    def enqueue(n):
        for batch in itertools.islice(iterator, n):
            queue.append(shard_batch(batch, mesh, axis_name))

    if size == 0:
        for batch in iterator:
            yield shard_batch(batch, mesh, axis_name)
        return

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def put_global(tree, mesh: Mesh, axis_name: str = "data"):
    """Shard a GLOBAL host array over the mesh's leading axis.

    Unlike shard_batch (whose multi-host contract is per-host shards from
    per-host datasets), every process holds the SAME full array here — the
    eval path, where each host loads the full image and rays are split
    across all devices of all hosts (reference models.py:611-616). Uses
    make_array_from_callback so each process only materializes its
    addressable shards."""
    sharding = data_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    def _put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])
    return jax.tree_util.tree_map(_put, tree)


def pad_to_multiple(tree, multiple: int, axis: int = 0):
    """Edge-pad every leaf's leading axis to a multiple; returns (tree, pad)."""
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(tree)
    n = leaves[0].shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return tree, 0
    def _pad(x):
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths, mode="edge")
    return jax.tree_util.tree_map(_pad, tree), pad
