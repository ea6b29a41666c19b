"""CrossViT — dual-branch multi-scale ViT with bidirectional CLS↔patch
cross-attention (parity target: reference cross_vit.py:232-303).

Per multi-scale round: independent small/large-patch encoders (each ending
with a LayerNorm — reference cross_vit.py:100,113), then each branch's CLS
token cross-attends over the *other* branch's patch tokens with
``kv_include_self=True`` (reference :75-76,157-158), projected in/out when
branch dims differ (reference :118-138).  Logits are the sum of both heads.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn

from vit_tpu.layers.common import (Dense, LayerNorm, MLP,
                                   fused_mlp_residual)
from vit_tpu.ops.attention import scaled_dot_product_attention
from vit_tpu.ops.patchify import patchify


class CrossAttention(nn.Module):
    """Reference cross_vit.py:52-93: separate q / kv projections, optional
    context with ``kv_include_self``."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context: Optional[jax.Array] = None,
                 kv_include_self: bool = False, training: bool = False):
        inner_dim = self.dim_head * self.heads
        ctx = x if context is None else context
        if kv_include_self:
            ctx = jnp.concatenate([x, ctx], axis=1)

        q = Dense(inner_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = Dense(inner_dim * 2, use_bias=False, dtype=self.dtype,
                   name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads),
            (q, k, v),
        )

        out = scaled_dot_product_attention(q, k, v, scale=self.dim_head ** -0.5)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class NormedTransformer(nn.Module):
    """Reference cross_vit.py:95-115 — standard encoder + trailing LayerNorm."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_mlp: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i in range(self.depth):
            h = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")(x)
            h = CrossAttention(self.dim, heads=self.heads,
                               dim_head=self.dim_head, dropout=self.dropout,
                               dtype=self.dtype, name=f"attn_{i}")(
                h, training=training)
            x = x + h
            norm = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}")
            mlp = MLP(self.dim, self.mlp_dim, dropout=self.dropout,
                      dtype=self.dtype, name=f"mlp_{i}")
            x = fused_mlp_residual(x, norm, mlp, self.dropout, training,
                                   self.dtype, self.fused_mlp)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class CrossTransformer(nn.Module):
    """Reference cross_vit.py:141-163."""

    sm_dim: int
    lg_dim: int
    depth: int
    heads: int
    dim_head: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sm_tokens, lg_tokens, training: bool = False):
        sm_cls, sm_patch = sm_tokens[:, :1], sm_tokens[:, 1:]
        lg_cls, lg_patch = lg_tokens[:, :1], lg_tokens[:, 1:]

        need_proj = self.sm_dim != self.lg_dim
        for i in range(self.depth):
            # small CLS attends large patches (in lg_dim space)
            h = sm_cls
            if need_proj:
                h = Dense(self.lg_dim, dtype=self.dtype,
                          name=f"sm_project_in_{i}")(h)
            h = LayerNorm(dtype=self.dtype, name=f"sm_attend_lg_norm_{i}")(h)
            h = CrossAttention(self.lg_dim, heads=self.heads,
                               dim_head=self.dim_head, dropout=self.dropout,
                               dtype=self.dtype, name=f"sm_attend_lg_{i}")(
                h, context=lg_patch, kv_include_self=True, training=training)
            if need_proj:
                h = Dense(self.sm_dim, dtype=self.dtype,
                          name=f"sm_project_out_{i}")(h)
            sm_cls = h + sm_cls

            # large CLS attends small patches (in sm_dim space)
            h = lg_cls
            if need_proj:
                h = Dense(self.sm_dim, dtype=self.dtype,
                          name=f"lg_project_in_{i}")(h)
            h = LayerNorm(dtype=self.dtype, name=f"lg_attend_sm_norm_{i}")(h)
            h = CrossAttention(self.sm_dim, heads=self.heads,
                               dim_head=self.dim_head, dropout=self.dropout,
                               dtype=self.dtype, name=f"lg_attend_sm_{i}")(
                h, context=sm_patch, kv_include_self=True, training=training)
            if need_proj:
                h = Dense(self.lg_dim, dtype=self.dtype,
                          name=f"lg_project_out_{i}")(h)
            lg_cls = h + lg_cls

        sm_tokens = jnp.concatenate([sm_cls, sm_patch], axis=1)
        lg_tokens = jnp.concatenate([lg_cls, lg_patch], axis=1)
        return sm_tokens, lg_tokens


class ImageEmbedder(nn.Module):
    """Reference cross_vit.py:199-229."""

    dim: int
    image_size: int
    patch_size: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, training: bool = False):
        assert self.image_size % self.patch_size == 0, \
            "Image dimensions must be divisible by the patch size."
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
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return x


class CrossViT(nn.Module):
    """Constructor parity: reference cross_vit.py:233-253."""

    image_size: int
    num_classes: int
    sm_dim: int
    lg_dim: int
    sm_patch_size: int = 12
    sm_enc_depth: int = 1
    sm_enc_heads: int = 8
    sm_enc_mlp_dim: int = 2048
    sm_enc_dim_head: int = 64
    lg_patch_size: int = 16
    lg_enc_depth: int = 4
    lg_enc_heads: int = 8
    lg_enc_mlp_dim: int = 2048
    lg_enc_dim_head: int = 64
    cross_attn_depth: int = 2
    cross_attn_heads: int = 8
    cross_attn_dim_head: int = 64
    depth: int = 3
    dropout: float = 0.1
    emb_dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        sm_tokens = ImageEmbedder(
            dim=self.sm_dim, image_size=self.image_size,
            patch_size=self.sm_patch_size, dropout=self.emb_dropout,
            dtype=self.dtype, name="sm_image_embedder",
        )(img, training=training)
        lg_tokens = ImageEmbedder(
            dim=self.lg_dim, image_size=self.image_size,
            patch_size=self.lg_patch_size, dropout=self.emb_dropout,
            dtype=self.dtype, name="lg_image_embedder",
        )(img, training=training)

        for r in range(self.depth):
            sm_tokens = NormedTransformer(
                self.sm_dim, self.sm_enc_depth, self.sm_enc_heads,
                self.sm_enc_dim_head, self.sm_enc_mlp_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"sm_enc_{r}",
            )(sm_tokens, training=training)
            lg_tokens = NormedTransformer(
                self.lg_dim, self.lg_enc_depth, self.lg_enc_heads,
                self.lg_enc_dim_head, self.lg_enc_mlp_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"lg_enc_{r}",
            )(lg_tokens, training=training)
            sm_tokens, lg_tokens = CrossTransformer(
                sm_dim=self.sm_dim, lg_dim=self.lg_dim,
                depth=self.cross_attn_depth, heads=self.cross_attn_heads,
                dim_head=self.cross_attn_dim_head, dropout=self.dropout,
                dtype=self.dtype, name=f"cross_attend_{r}",
            )(sm_tokens, lg_tokens, training=training)

        sm_cls, lg_cls = sm_tokens[:, 0], lg_tokens[:, 0]
        sm_logits = Dense(
            self.num_classes, dtype=self.dtype, name="sm_head",
        )(LayerNorm(dtype=self.dtype, name="sm_head_norm")(sm_cls))
        lg_logits = Dense(
            self.num_classes, dtype=self.dtype, name="lg_head",
        )(LayerNorm(dtype=self.dtype, name="lg_head_norm")(lg_cls))
        return sm_logits + lg_logits
