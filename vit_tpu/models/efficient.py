""""Efficient" ViT — a ViT shell with an injectable encoder
(parity target: reference efficient.py:13-55).

The dependency-inversion hook of the reference (efficient.py:14,30): any
module with signature ``(tokens, training) -> tokens`` can serve as the
encoder (e.g. a Linformer/Performer-style encoder).  No embedding dropout,
matching the reference.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import repeat
from flax import linen as nn

from vit_tpu.core.helpers import pair
from vit_tpu.layers.common import Dense, LayerNorm
from vit_tpu.ops.patchify import patchify


class ViT(nn.Module):
    """Constructor parity: reference efficient.py:14."""

    image_size: Any
    patch_size: int
    num_classes: int
    dim: int
    transformer: nn.Module
    pool: str = "cls"
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        h, w = pair(self.image_size)
        assert h % self.patch_size == 0 and w % self.patch_size == 0, \
            "image dimensions must be divisible by the patch size"
        assert self.pool in {"cls", "mean"}, \
            "pool type must be either cls (cls token) or mean (mean pooling)"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        h, w = pair(self.image_size)
        num_patches = (h // self.patch_size) * (w // self.patch_size)

        x = patchify(img, self.patch_size, self.patch_size)
        x = Dense(self.dim, dtype=self.dtype, name="patch_embedding")(x)
        b, n, _ = x.shape

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches + 1, self.dim))

        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos_embedding[:, : (n + 1)].astype(x.dtype)
        x = self.transformer(x, training=training)

        if self.pool == "mean":
            x = jnp.mean(x, axis=1)
        else:
            x = x[:, 0]

        x = LayerNorm(dtype=self.dtype, name="head_norm")(x)
        x = Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
