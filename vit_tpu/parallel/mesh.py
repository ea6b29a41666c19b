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
