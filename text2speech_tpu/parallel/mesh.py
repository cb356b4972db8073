"""Device mesh + sharding helpers — the TPU replacement for the reference's
NCCL data-parallel stack (``/root/reference/waveglow/distributed.py``:
process launcher, param broadcast, bucketed gradient all-reduce hooks;
SURVEY.md §2.4).

Under pjit/jit-with-shardings none of that machinery exists as code: the batch
axis is sharded over the ``'data'`` mesh axis, XLA inserts the gradient
all-reduce (psum over ICI), and parameter replication is a sharding
annotation.  Multi-host runs call :func:`initialize_distributed` (one process
per host) and the same program scales over DCN by adding a leading mesh axis.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> bool:
    """Multi-host bring-up (replaces ``init_distributed``,
    ``waveglow/distributed.py:43-53``).  Returns True if the distributed
    runtime was (or already is) initialized, False for a plain single-host
    run.

    Initialization triggers when either (a) a coordinator address is given —
    as an argument or via the standard env vars ``JAX_COORDINATOR_ADDRESS`` /
    ``COORDINATOR_ADDRESS`` — or (b) a managed multi-host environment is
    auto-detectable by JAX (TPU pod / Slurm / GKE: ``TPU_WORKER_HOSTNAMES``,
    ``SLURM_JOB_NUM_NODES`` > 1, ``MEGASCALE_COORDINATOR_ADDRESS``).
    Passing only tuning kwargs does NOT force-initialize on a single host.
    Safe to call twice (the second call is a no-op)."""
    coordinator_address = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    # TPU_WORKER_HOSTNAMES is set even on single-host rigs (e.g.
    # "localhost"); only a multi-entry list implies a pod's worth of
    # processes needing the distributed runtime.
    tpu_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_detectable = (
        len([h for h in tpu_hosts.split(",") if h.strip()]) > 1
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or int(os.environ.get("SLURM_JOB_NUM_NODES", "1") or 1) > 1
    )
    if not coordinator_address and not auto_detectable:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
    return True


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    axis_names: tuple[str, ...] = (DATA_AXIS,),
) -> Mesh:
    """1-D data-parallel mesh over all devices (the reference's only
    parallelism, SURVEY.md §2.3); extend axis_names for tp/pp later."""
    if devices is None:
        devices = jax.devices()
    arr = np.asarray(devices).reshape((-1,) + (1,) * (len(axis_names) - 1))
    return Mesh(arr, axis_names)


def make_data_mesh(batch_size: int, devices=None) -> Mesh:
    """Data mesh over the most devices that evenly divide ``batch_size``
    (a 2-utterance debug batch on an 8-device host shouldn't crash)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host pytree batch with the leading axis sharded over 'data'
    (replaces DistributedSampler + to_gpu: ``waveglow/train.py:90``,
    ``utils/data_utils.py:39-44``)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate params/opt-state across the mesh (replaces the rank-0
    broadcast at ``waveglow/distributed.py:100-103``)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_map_norep(run, mesh: Mesh, in_specs, out_specs):
    """``shard_map`` with replication checking off, across jax API renames
    (the kwarg is ``check_rep`` in older jax, ``check_vma`` in newer).
    Used by the tensor-parallel serving paths (``tp.py``, ``tp_tacotron.py``)
    and the sequence-parallel fused vocoder (``models/chunked.py``)."""
    import inspect

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    kw = {}
    sig = inspect.signature(shard_map)
    if "check_rep" in sig.parameters:       # older API name
        kw["check_rep"] = False
    elif "check_vma" in sig.parameters:
        kw["check_vma"] = False
    return shard_map(
        run, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw
    )
