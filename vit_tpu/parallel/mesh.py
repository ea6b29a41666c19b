"""Device-mesh construction.

The reference has no parallelism of any kind (SURVEY.md §2.5); here the
scaling path is declarative: a `jax.sharding.Mesh` with named ``data`` /
``model`` axes, sharding annotations on params and batches, and XLA-inserted
collectives over ICI.  DP rides the ``data`` axis (grad psum), TP the
``model`` axis (attention heads / MLP hidden).  PP/SP/EP are documented
non-goals for this model family (max seq 257 tokens, no MoE) — SURVEY.md §2.5.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> tuple[int, int]:
    """Multi-process (pod-scale) entry point — SURVEY.md §2.5 comm backend.

    Call once per host process *before any other JAX call*.  On Cloud TPU
    pods every argument auto-detects from the TPU metadata server, so the
    canonical pod launch is simply ``initialize_distributed()`` in each
    process; on other platforms pass the coordinator explicitly.  After
    this, ``jax.devices()`` spans the whole pod, ``make_mesh`` lays the
    global mesh over it (DP over ICI/DCN, TP within hosts), and the jitted
    train steps in :mod:`vit_tpu.parallel.train` run SPMD with
    XLA-inserted collectives — no per-rank communication code anywhere.

    Per-process input pipelines feed the global batch via
    :func:`vit_tpu.utils.data.shard_batch`, which assembles process-local
    shards into global arrays (each host loads only its
    ``global_batch // process_count`` slice — see
    :func:`vit_tpu.utils.data.process_local_batch_size`).

    Returns ``(process_index, process_count)``.  Safe to call in a
    single-process run: it is a no-op there (process_count stays 1).
    """
    kwargs = {
        "coordinator_address": coordinator_address,
        "num_processes": num_processes,
        "process_id": process_id,
        "local_device_ids": local_device_ids,
    }
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    if num_processes == 1:
        return 0, 1  # nothing to coordinate
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if kwargs:
            raise  # explicit pod config that failed — surface it
        # bare auto-detect outside a pod environment: single-process run
    return jax.process_index(), jax.process_count()


def make_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the ``data`` axis, ``model`` axis of size 1 —
    pure DP, the north-star scaling path (BASELINE.json).  Pass e.g.
    ``mesh_shape=(4, 2)`` for 4-way DP × 2-way TP.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(mesh_shape)) == n, (
        f"mesh shape {mesh_shape} does not cover {n} devices"
    )
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
