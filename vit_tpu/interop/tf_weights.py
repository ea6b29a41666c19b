"""TF→JAX weight transplant utilities.

Moves trained weights from the TF/Keras reference models (built from
/root/reference/vit_tensorflow) into vit-tpu param pytrees — the mechanism
behind the golden parity suite (SURVEY.md §4: "transplant weights from the TF
reference into the JAX model per variant and assert logits within 1e-4").

Conventions line up with no transposes needed:
  Keras Dense kernel (in, out)   == flax Dense kernel (in, out)
  Keras Conv2D kernel (h,w,i,o)  == flax Conv kernel (h,w,i,o)
  Keras LayerNorm gamma/beta     == flax LayerNorm scale/bias
Depthwise convs differ: Keras groups-conv / DepthwiseConv2D kernels reshape
to flax's feature_group_count layout (see ``conv_groups_kernel``).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def t(x) -> np.ndarray:
    """TF variable/tensor → numpy."""
    return np.asarray(x)


def set_(params: dict, path: str, value) -> None:
    """Set ``params['a']['b']...`` by '/'-joined path, asserting the leaf
    exists and the shape matches (catches transplant drift early)."""
    keys = path.split("/")
    node = params
    for k in keys[:-1]:
        node = node[k]
    leaf = keys[-1]
    assert leaf in node, f"no param leaf {path!r}; have {list(node.keys())}"
    value = np.asarray(value)
    assert node[leaf].shape == value.shape, (
        f"shape mismatch at {path}: ours {node[leaf].shape} vs tf {value.shape}"
    )
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def dense(params: dict, prefix: str, tf_dense) -> None:
    set_(params, f"{prefix}/kernel", t(tf_dense.kernel))
    if getattr(tf_dense, "bias", None) is not None and tf_dense.use_bias:
        set_(params, f"{prefix}/bias", t(tf_dense.bias))


def layernorm(params: dict, prefix: str, tf_ln) -> None:
    set_(params, f"{prefix}/scale", t(tf_ln.gamma))
    set_(params, f"{prefix}/bias", t(tf_ln.beta))


def conv(params: dict, prefix: str, tf_conv) -> None:
    set_(params, f"{prefix}/kernel", t(tf_conv.kernel))
    if tf_conv.use_bias:
        set_(params, f"{prefix}/bias", t(tf_conv.bias))


def conv_groups_kernel(tf_kernel: np.ndarray, groups: int) -> np.ndarray:
    """Keras grouped-Conv2D kernel (h, w, cin/groups, cout) is already the
    layout flax uses for ``feature_group_count`` — identity, kept as a named
    hook in case of future layout divergence."""
    return t(tf_kernel)


def batchnorm(params: dict, batch_stats: dict, prefix: str, tf_bn) -> None:
    set_(params, f"{prefix}/scale", t(tf_bn.gamma))
    set_(params, f"{prefix}/bias", t(tf_bn.beta))
    set_(batch_stats, f"{prefix}/mean", t(tf_bn.moving_mean))
    set_(batch_stats, f"{prefix}/var", t(tf_bn.moving_variance))


def to_mutable(tree):
    """FrozenDict/dict pytree → nested plain dict of numpy arrays."""
    if hasattr(tree, "items"):
        return {k: to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


# ---------------------------------------------------------------------------
# Per-model transplants
# ---------------------------------------------------------------------------

def transplant_mlp(params, prefix, tf_mlp) -> None:
    """Reference MLP (vit.py:24-47): Sequential[Dense, GELU, Drop, Dense, Drop]."""
    dense(params, f"{prefix}/fc1", tf_mlp.net.layers[0])
    dense(params, f"{prefix}/fc2", tf_mlp.net.layers[3])


def transplant_attention(params, prefix, tf_attn) -> None:
    """Reference Attention (vit.py:49-85)."""
    dense(params, f"{prefix}/to_qkv", tf_attn.to_qkv)
    if len(tf_attn.to_out.layers) > 0:
        dense(params, f"{prefix}/to_out", tf_attn.to_out.layers[0])


def transplant_transformer(params, prefix, tf_tr) -> None:
    """Reference Transformer (vit.py:87-104): list of [PreNorm(Attn), PreNorm(MLP)]."""
    for i, (pre_attn, pre_mlp) in enumerate(tf_tr.layers):
        layernorm(params, f"{prefix}/attn_norm_{i}", pre_attn.norm)
        transplant_attention(params, f"{prefix}/attn_{i}", pre_attn.fn)
        layernorm(params, f"{prefix}/mlp_norm_{i}", pre_mlp.norm)
        transplant_mlp(params, f"{prefix}/mlp_{i}", pre_mlp.fn)


def transplant_vit(tf_model, variables) -> dict:
    """TF reference ViT (vit.py:106-177) → vit_tpu.models.vit.ViT variables."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    transplant_transformer(p, "transformer", tf_model.transformer)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v
