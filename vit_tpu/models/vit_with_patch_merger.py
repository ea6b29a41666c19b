"""ViT + PatchMerger — learned-query token reduction mid-stack
(parity target: reference vit_with_patch_merger.py:136-184; merger :42-55).

``PatchMerger`` is a public standalone module (reference README.md:815-829):
LayerNorm, then softmax(queries · xᵀ·scale) · x reduces n tokens to
``num_tokens_out``.  Inserted after layer ``patch_merge_layer`` (default
depth//2).  No CLS token; mean-pool head.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_tpu.core.helpers import default, pair
from vit_tpu.layers.common import (Attention, Dense, LayerNorm,
                                   MLP, fused_mlp_residual)
from vit_tpu.ops.patchify import patchify


class PatchMerger(nn.Module):
    """Reference vit_with_patch_merger.py:42-55."""

    dim: int
    num_tokens_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        queries = self.param("queries", nn.initializers.normal(1.0),
                             (self.num_tokens_out, self.dim))
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        sim = jnp.einsum(
            "qd,bnd->bqn", queries.astype(x.dtype),
            x * (self.dim ** -0.5),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(sim, axis=-1)
        return jnp.einsum("bqn,bnd->bqd", attn.astype(x.dtype), x,
                          preferred_element_type=jnp.float32).astype(x.dtype)


class ViT(nn.Module):
    """Constructor parity: reference vit_with_patch_merger.py:137-149."""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    patch_merge_layer: Optional[int] = None
    patch_merge_num_tokens: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Any = jnp.float32
    # Fused-MLP dispatch for the pre-norm MLP half ("auto"/"never"/
    # "interpret"); this model's attention keeps its own path.
    fused_mlp: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        assert ih % ph == 0 and iw % pw == 0, \
            "Image dimensions must be divisible by the patch size."

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        num_patches = (ih // ph) * (iw // pw)

        x = patchify(img, ph, pw)
        x = Dense(self.dim, dtype=self.dtype, name="patch_embedding")(x)
        b, n, _ = x.shape

        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches + 1, self.dim))
        x = x + pos_embedding[:, :n].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)

        merge_index = default(self.patch_merge_layer, self.depth // 2) - 1
        for i in range(self.depth):
            h = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")(x)
            h = Attention(self.dim, heads=self.heads, dim_head=self.dim_head,
                          dropout=self.dropout, dtype=self.dtype,
                          name=f"attn_{i}")(h, training=training)
            x = x + h
            norm = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}")
            mlp = MLP(self.dim, self.mlp_dim, dropout=self.dropout,
                      dtype=self.dtype, name=f"mlp_{i}")
            x = fused_mlp_residual(x, norm, mlp, self.dropout, training,
                                   self.dtype, self.fused_mlp)
            if i == merge_index:
                x = PatchMerger(self.dim, self.patch_merge_num_tokens,
                                dtype=self.dtype, name="patch_merger")(x)

        x = jnp.mean(x, axis=1)
        x = LayerNorm(dtype=self.dtype, name="head_norm")(x)
        x = Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
