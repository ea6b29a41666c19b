"""Parameter sharding rules for tensor parallelism.

Every transformer in the framework funnels through the shared layer names
(``to_qkv`` / ``to_out`` / ``fc1`` / ``fc2`` — vit_tpu.layers.common), so one
rule table covers the whole model zoo: attention inner projections and the
MLP hidden dim shard over the ``model`` axis (Megatron-style column→row
pairing: qkv/fc1 split their output dim, to_out/fc2 split their input dim so
XLA inserts a single all-reduce per block); everything else replicates.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_tpu.parallel.mesh import MODEL_AXIS


def _spec_for_path(path: tuple[str, ...], leaf: Any) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    leafname = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""

    if leafname == "kernel":
        if parent in ("to_qkv", "to_q", "to_kv", "to_v", "fc1"):
            return P(None, MODEL_AXIS)  # column parallel (output dim)
        if parent in ("to_out", "fc2"):
            return P(MODEL_AXIS, None)  # row parallel (input dim)
    if leafname == "bias" and parent in ("fc1",):
        return P(MODEL_AXIS)
    return P()


def param_specs(params) -> Any:
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params)
    )


def shard_params(mesh: Mesh, params):
    """Place a param pytree onto the mesh according to the rule table."""
    return jax.device_put(params, param_shardings(mesh, params))
