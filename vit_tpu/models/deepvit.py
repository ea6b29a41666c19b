"""DeepViT — re-attention ViT (parity target: reference deepvit.py:112-157).

Re-attention mixes the *post-softmax* attention matrix across heads with a
learned heads×heads matrix and LayerNorms over the head axis (reference
deepvit.py:82-84).  Because the recurrence needs the materialized attention
matrix, this variant uses the XLA attention path (materialize → mix → norm →
aggregate), which XLA fuses; the flash kernel serves the plain variants
(SURVEY.md §7.3 item 4).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn

from vit_tpu.layers.common import (Dense, LayerNorm, MLP,
                                   fused_mlp_residual)
from vit_tpu.ops.attention import attention_weights, apply_attention
from vit_tpu.ops.patchify import patchify


class ReAttention(nn.Module):
    """Reference deepvit.py:46-91."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inner_dim = self.dim_head * self.heads
        qkv = Dense(inner_dim * 3, use_bias=False, dtype=self.dtype,
                    name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads),
            (q, k, v),
        )

        attn = attention_weights(q, k, scale=self.dim_head ** -0.5)

        # re-attention: learned head mix of the post-softmax matrix
        reattn_weights = self.param(
            "reattn_weights", nn.initializers.normal(1.0),
            (self.heads, self.heads),
        )
        attn = jnp.einsum("bhij,hg->bgij", attn,
                          reattn_weights.astype(attn.dtype))
        # LayerNorm over the head axis (rearranged to last — deepvit.py:59-63)
        attn = rearrange(attn, "b h i j -> b i j h")
        attn = LayerNorm(dtype=jnp.float32, name="reattn_norm")(attn)
        attn = rearrange(attn, "b i j h -> b h i j")

        out = apply_attention(attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class DeepViT(nn.Module):
    """Constructor parity: reference deepvit.py:113-114."""

    image_size: int
    patch_size: int
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
    # Fused-MLP dispatch for the pre-norm MLP half ("auto"/"never"/
    # "interpret"); re-attention itself always rides XLA.
    fused_mlp: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        assert self.image_size % self.patch_size == 0, \
            "Image dimensions must be divisible by the patch size."
        assert self.pool in {"cls", "mean"}, \
            "pool type must be either cls (cls token) or mean (mean pooling)"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        num_patches = (self.image_size // self.patch_size) ** 2

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
        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)

        for i in range(self.depth):
            h = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")(x)
            h = ReAttention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, dtype=self.dtype, name=f"attn_{i}",
            )(h, training=training)
            x = x + h
            norm = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}")
            mlp = MLP(self.dim, self.mlp_dim, dropout=self.dropout,
                      dtype=self.dtype, name=f"mlp_{i}")
            x = fused_mlp_residual(x, norm, mlp, self.dropout, training,
                                   self.dtype, self.fused_mlp)

        if self.pool == "mean":
            x = jnp.mean(x, axis=1)
        else:
            x = x[:, 0]

        x = LayerNorm(dtype=self.dtype, name="head_norm")(x)
        x = Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
