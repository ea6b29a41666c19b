"""Parameter sharding rules for tensor parallelism.

Every transformer in the framework funnels through the shared layer names
(``to_qkv`` / ``to_q`` / ``to_kv`` / ``to_v`` / ``to_out`` / ``fc1`` /
``fc2`` — vit_tpu.layers.common and the conv hybrids), so one rule table
covers the whole model zoo: attention inner projections and the MLP hidden
dim shard over the ``model`` axis (Megatron-style column→row pairing:
qkv/fc1 split their output dim, to_out/fc2 split their input dim so XLA
inserts a single all-reduce per block); everything else replicates.

Rules are rank-aware: Dense kernels are (in, out); the conv hybrids'
1×1-conv projections (LeViT/CvT/Twins/ScalableViT — kernels
``(kh, kw, in, out)``) shard their channel dims the same way, including
the ``pointwise`` half of CvT's depthwise-separable projections.  Grouped
(depthwise) kernels replicate — their channel dims are not freely
divisible across the axis.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_tpu.parallel.mesh import MODEL_AXIS

_COLUMN = ("to_qkv", "to_q", "to_kv", "to_v", "fc1")
_ROW = ("to_out", "fc2")


def _normalize(name: str) -> str:
    """Module name → rule key: strip the per-layer index suffix and the
    ``mlp_`` prefix (NesT/CvT name their 1×1 conv-MLP halves
    ``mlp_fc1_3``; Twins names its blocks ``ff1_0/fc1``)."""
    name = _INDEX_SUFFIX.sub("", name)
    if name.startswith("mlp_"):
        name = name[4:]
    return name


_INDEX_SUFFIX = re.compile(r"(_\d+)+$")


def _spec_for_path(path: tuple[str, ...], leaf: Any) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    leafname = names[-1] if names else ""
    parent = _normalize(names[-2]) if len(names) >= 2 else ""
    grandparent = _normalize(names[-3]) if len(names) >= 3 else ""
    # CvT-style separable projection: the 1×1 pointwise half carries the
    # channel mixing; the depthwise half replicates (grouped kernel).
    if parent == "pointwise" and grandparent in _COLUMN + _ROW:
        parent = grandparent
    elif parent == "depthwise":
        return P()

    ndim = getattr(leaf, "ndim", None)
    if leafname == "kernel" and ndim in (2, 4):
        if parent in _COLUMN:
            # column parallel: split the output-channel (minor) dim
            return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
        if parent in _ROW:
            # row parallel: split the input-channel dim
            return P(*([None] * (ndim - 2) + [MODEL_AXIS, None]))
    if leafname == "bias" and parent in _COLUMN:
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
