"""ViT — canonical Vision Transformer (parity target: reference vit.py:106-177).

Same public constructor kwargs as the reference (vit.py:107-108); the forward
is one jit-compiled function: strided-reshape patch embedding fused into the
embedding GEMM, pre-norm encoder over the shared flash-attention op, cls/mean
pooling, LayerNorm+Dense head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import repeat
from flax import linen as nn

from vit_tpu.core.helpers import pair
from vit_tpu.layers.common import Dense, LayerNorm, Transformer
from vit_tpu.ops.patchify import patchify


class ViT(nn.Module):
    """Constructor parity: reference vit.py:107-108."""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0, \
            "Image dimensions must be divisible by the patch size."
        assert self.pool in {"cls", "mean"}, \
            "pool type must be either cls (cls token) or mean (mean pooling)"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        patch_height, patch_width = pair(self.patch_size)
        image_height, image_width = pair(self.image_size)
        num_patches = (image_height // patch_height) * (image_width // patch_width)

        x = patchify(img, patch_height, patch_width)
        x = Dense(self.dim, dtype=self.dtype, name="patch_embedding")(x)
        b, n, _ = x.shape

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, num_patches + 1, self.dim),
        )

        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos_embedding[:, : (n + 1)].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)

        x = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            dropout=self.dropout, dtype=self.dtype, name="transformer",
        )(x, training=training)

        if self.pool == "mean":
            x = jnp.mean(x, axis=1)
        else:
            x = x[:, 0]

        x = LayerNorm(dtype=self.dtype, name="head_norm")(x)
        x = Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
