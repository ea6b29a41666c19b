"""Scan-compiled transformer — compile-time/memory lever for deep stacks.

``Transformer`` (vit_tpu.layers.common) unrolls its depth, which XLA fuses
best for shallow encoders but costs compile time linear in depth.
``ScannedTransformer`` is numerically identical with params stacked along a
leading depth axis and the layer loop lowered to ``lax.scan`` — one layer
compiled once.  ``remat=True`` adds rematerialization (recompute the layer
in backward instead of storing activations — HBM for FLOPs).

``stack_transformer_params`` converts an unrolled ``Transformer`` param
tree (``attn_0 …``/``mlp_0 …``) into the stacked layout, so transplanted /
trained checkpoints move freely between the two.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_tpu.layers.common import Attention, LayerNorm, MLP


class _Block(nn.Module):
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    training: bool = False
    dtype: Any = jnp.float32
    fused: str = "auto"

    @nn.compact
    def __call__(self, x, _=None):
        from vit_tpu.layers.common import (
            _fused_attention_tier, _fused_mlp_eligible,
            apply_fused_attention_block, apply_fused_mlp_block,
        )

        norm = LayerNorm(dtype=self.dtype, name="attn_norm")
        attn = Attention(self.dim, heads=self.heads, dim_head=self.dim_head,
                         dropout=self.dropout, dtype=self.dtype, name="attn")
        # Only the token-major tier composes with scan (the nmajor tier
        # transposes around the whole unrolled stack, which scan can't).
        if self.fused != "never" and _fused_attention_tier(
                x, self.dropout, self.training, self.dtype, self.heads,
                self.dim_head, self.dim, self.fused) == "bmajor":
            x = apply_fused_attention_block(
                norm, attn, x, self.heads, self.dim_head,
                interpret=self.fused == "interpret")
        else:
            x = x + attn(norm(x), training=self.training)

        norm = LayerNorm(dtype=self.dtype, name="mlp_norm")
        mlp = MLP(self.dim, self.mlp_dim, dropout=self.dropout,
                  dtype=self.dtype, name="mlp")
        if self.fused != "never" and _fused_mlp_eligible(
                x, self.dropout, self.training, self.dtype, self.fused):
            x = apply_fused_mlp_block(
                norm, mlp, x, interpret=self.fused == "interpret")
        else:
            x = x + mlp(norm(x), training=self.training)
        return x, None


class ScannedTransformer(nn.Module):
    """Drop-in encoder with ``lax.scan`` over stacked layer params."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    remat: bool = False
    dtype: Any = jnp.float32
    # Fused Pallas blocks under lax.scan measured 2.4× slower at runtime
    # (B/16 train 60→146 ms/step) while barely helping compile — scan is
    # the compile-time lever, the kernels are the runtime lever, and they
    # do not compose today.  Opt in explicitly if that changes.
    fused: str = "never"

    @nn.compact
    def __call__(self, x, training: bool = False):
        block = _Block
        if self.remat:
            block = nn.remat(block, prevent_cse=False)

        scanned = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.depth,
        )(self.dim, self.heads, self.dim_head, self.mlp_dim,
          dropout=self.dropout, training=training, dtype=self.dtype,
          fused=self.fused, name="layers")
        out, _ = scanned(x, None)
        return out


def stack_transformer_params(unrolled: dict, depth: int) -> dict:
    """Unrolled Transformer params (attn_norm_i/attn_i/mlp_norm_i/mlp_i)
    → ScannedTransformer params ({'layers': {...}} stacked on axis 0)."""
    def stacked(prefix):
        subtrees = [unrolled[f"{prefix}_{i}"] for i in range(depth)]
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *subtrees)

    return {"layers": {
        "attn_norm": stacked("attn_norm"),
        "attn": stacked("attn"),
        "mlp_norm": stacked("mlp_norm"),
        "mlp": stacked("mlp"),
    }}


def unstack_transformer_params(stacked: dict, depth: int) -> dict:
    """Inverse of :func:`stack_transformer_params`."""
    layers = stacked["layers"]
    out = {}
    for i in range(depth):
        for name in ("attn_norm", "attn", "mlp_norm", "mlp"):
            out[f"{name}_{i}"] = jax.tree.map(
                lambda x: np.asarray(x[i]), layers[name])
    return out
