"""ViT — canonical Vision Transformer (parity target: reference vit.py:106-177).

Same public constructor kwargs as the reference (vit.py:107-108); the forward
is one jit-compiled function: strided-reshape patch embedding fused into the
embedding GEMM, pre-norm encoder over the shared flash-attention op, cls/mean
pooling, LayerNorm+Dense head.

Unlike the reference — whose self-supervised wrappers spelunk encoder
attributes (SURVEY.md §3.2) — this ViT exposes an explicit encoder protocol
(:meth:`to_patch`, :meth:`patch_to_emb`, ``.pos_embedding``/``.cls_token``
params and the ``.transformer`` submodule) that MAE/SimMIM/MPP build on.
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
    scan_layers: bool = False
    # Kernel-dispatch overrides, forwarded to the encoder: "auto"
    # (measured windows), "hybrid" (adds the short-sequence opt-in tier),
    # "never" (exact XLA everywhere), "interpret" (tests).  See
    # layers/common.Transformer.
    fused_attention: str = "auto"
    fused_mlp: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0, \
            "Image dimensions must be divisible by the patch size."
        assert self.pool in {"cls", "mean"}, \
            "pool type must be either cls (cls token) or mean (mean pooling)"

    @property
    def num_patches(self) -> int:
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        return (ih // ph) * (iw // pw)

    def setup(self):
        self.patch_embedding = Dense(self.dim, dtype=self.dtype,
                                     name="patch_embedding")
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, self.num_patches + 1, self.dim))
        self.emb_dropout_layer = nn.Dropout(self.emb_dropout)
        if self.scan_layers:
            # lax.scan over stacked layer params: one layer compiled once —
            # compile time O(1) in depth instead of O(depth).  Param tree
            # differs from the unrolled default; checkpoints convert via
            # vit_tpu.layers.scan.stack_transformer_params.
            from vit_tpu.layers.scan import ScannedTransformer

            self.transformer = ScannedTransformer(
                self.dim, self.depth, self.heads, self.dim_head,
                self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
                fused=self.fused_attention, name="transformer")
        else:
            self.transformer = Transformer(
                self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
                dropout=self.dropout, dtype=self.dtype,
                fused_attention=self.fused_attention,
                fused_mlp=self.fused_mlp, name="transformer")
        self.head_norm = LayerNorm(dtype=self.dtype, name="head_norm")
        self.head = Dense(self.num_classes, dtype=self.dtype, name="head")

    # --- encoder protocol (used by MAE / SimMIM / MPP) -------------------
    def to_patch(self, img: jax.Array) -> jax.Array:
        """Pixels → (b, n, p²·c) patch vectors (reference vit.py:142)."""
        ph, pw = pair(self.patch_size)
        return patchify(img, ph, pw)

    def patch_to_emb(self, patches: jax.Array) -> jax.Array:
        """Patch vectors → tokens via the embedding GEMM."""
        return self.patch_embedding(patches)

    # ---------------------------------------------------------------------
    def embed(self, img: jax.Array, training: bool = False) -> jax.Array:
        """Shared embed path: patchify → embed → +CLS → +pos → dropout.

        Large patches (patch_dim ≥ ~1536, e.g. the canonical /32 configs)
        route through :func:`vit_tpu.ops.patchify.patch_embed` — XLA's
        fused-transpose GEMM runs at ~40% MXU rate there (measured ×1.9
        slower than the einsum form on v5e); small patches keep the
        fused form, which wins at that shape.  Same math either way.
        """
        from vit_tpu.ops.patchify import patch_embed, patch_embed_wins

        ph, pw = pair(self.patch_size)
        c = img.shape[-1]
        if patch_embed_wins(ph, pw, c):
            # Dummy-declare the Dense so its params exist, then run the
            # einsum form over the same kernel/bias.
            self.patch_embedding(jnp.zeros((1, 1, ph * pw * c), img.dtype))
            pp = self.patch_embedding.variables["params"]
            x = patch_embed(img.astype(self.dtype),
                            pp["kernel"].astype(self.dtype),
                            pp["bias"].astype(self.dtype), ph, pw)
        else:
            x = self.patch_to_emb(self.to_patch(img))
        b, n, _ = x.shape
        cls_tokens = repeat(self.cls_token.astype(x.dtype),
                            "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + self.pos_embedding[:, : (n + 1)].astype(x.dtype)
        return self.emb_dropout_layer(x, deterministic=not training)

    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        x = self.embed(img, training=training)
        x = self.transformer(x, training=training)

        if self.pool == "mean":
            x = jnp.mean(x, axis=1)
        else:
            x = x[:, 0]

        return self.head(self.head_norm(x))
