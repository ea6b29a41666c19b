"""Parallel ViT — N parallel attention/FFN branches per depth, summed
(parity target: reference parallel_vit.py:119-178; ``Parallel`` at 36-42).

TPU note: the reference evaluates branches in a Python loop; XLA fuses the
unrolled branch sum into one program, and branch matmuls batch onto the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import repeat
from flax import linen as nn

from vit_tpu.core.helpers import pair
from vit_tpu.layers.common import Attention, Dense, LayerNorm, MLP
from vit_tpu.ops.patchify import patchify


class ViT(nn.Module):
    """Constructor parity: reference parallel_vit.py:120-133."""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    num_parallel_branches: int = 2
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        assert ih % ph == 0 and iw % pw == 0, \
            "Image dimensions must be divisible by the patch size."
        assert self.pool in {"cls", "mean"}, \
            "pool type must be either cls (cls token) or mean (mean pooling)"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        num_patches = (ih // ph) * (iw // pw)

        x = patchify(img, ph, pw)
        x = Dense(self.dim, dtype=self.dtype, name="patch_embedding")(x)
        b, n, _ = x.shape

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches + 1, self.dim))

        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos_embedding[:, : (n + 1)].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)

        for i in range(self.depth):
            # parallel attention branches, summed (parallel_vit.py:36-42,107-111)
            attn_sum = 0.0
            for j in range(self.num_parallel_branches):
                h = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}_{j}")(x)
                h = Attention(
                    self.dim, heads=self.heads, dim_head=self.dim_head,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"attn_{i}_{j}",
                )(h, training=training)
                attn_sum = attn_sum + h
            x = attn_sum + x

            ff_sum = 0.0
            for j in range(self.num_parallel_branches):
                h = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}_{j}")(x)
                h = MLP(self.dim, self.mlp_dim, dropout=self.dropout,
                        dtype=self.dtype, name=f"mlp_{i}_{j}")(h, training=training)
                ff_sum = ff_sum + h
            x = ff_sum + x

        if self.pool == "mean":
            x = jnp.mean(x, axis=1)
        else:
            x = x[:, 0]

        x = LayerNorm(dtype=self.dtype, name="head_norm")(x)
        x = Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
