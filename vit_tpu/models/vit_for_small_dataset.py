"""ViT for small datasets — Shifted Patch Tokenization + Locality
Self-Attention (parity target: reference vit_for_small_dataset.py:159-215).

SPT concatenates four zero-padded diagonal shifts channel-wise before
patchify+LN+Dense (reference :142-157, shift :15-47); LSA uses a learnable
log-temperature and masks the attention diagonal to -f32.max (reference
:88-121).  Both ``SPT`` and ``LSA`` are public standalone modules (reference
README.md:860-875).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn

from vit_tpu.core.helpers import pair
from vit_tpu.layers.common import (Dense, LayerNorm, MLP,
                                   fused_mlp_residual)
from vit_tpu.ops.attention import apply_attention, mask_value
from vit_tpu.ops.patchify import patchify


def shift_4(x: jax.Array) -> list[jax.Array]:
    """Four zero-padded single-pixel shifts (reference :15-47): right, left,
    down, up — implemented as pad+slice (XLA lowers to cheap copies)."""
    pad = jnp.pad
    right = pad(x[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
    left = pad(x[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
    down = pad(x[:, :-1, :, :], ((0, 0), (1, 0), (0, 0), (0, 0)))
    up = pad(x[:, 1:, :, :], ((0, 0), (0, 1), (0, 0), (0, 0)))
    return [right, left, down, up]


class SPT(nn.Module):
    """Shifted Patch Tokenization (reference :142-157).

    ``channels`` mirrors the reference constructor (README.md:861-869);
    Flax infers input widths, so it only documents the expected input.
    """

    dim: int
    patch_size: int
    channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.concatenate([x, *shift_4(x)], axis=-1)
        x = patchify(x, self.patch_size, self.patch_size)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = Dense(self.dim, dtype=self.dtype, name="proj")(x)
        return x


class LSA(nn.Module):
    """Locality Self-Attention (reference :88-121): learnable temperature,
    diagonal self-mask."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inner_dim = self.dim_head * self.heads
        temperature = self.param(
            "temperature",
            lambda key: jnp.log(jnp.asarray(self.dim_head ** -0.5, jnp.float32)),
        )

        qkv = Dense(inner_dim * 3, use_bias=False, dtype=self.dtype,
                    name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads),
            (q, k, v),
        )

        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * jnp.exp(temperature)
        n = dots.shape[-1]
        eye = jnp.eye(n, dtype=bool)
        dots = jnp.where(eye, mask_value(dots.dtype), dots)
        attn = jax.nn.softmax(dots, axis=-1)

        out = apply_attention(attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class ViT(nn.Module):
    """Constructor parity: reference vit_for_small_dataset.py:160-172."""

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
    # Fused-MLP dispatch for the pre-norm MLP half ("auto"/"never"/
    # "interpret"); this model's attention keeps its own path.
    fused_mlp: str = "auto"

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

        x = SPT(dim=self.dim, patch_size=ph, dtype=self.dtype,
                name="patch_embedding")(img, training=training)
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
            h = LSA(self.dim, heads=self.heads, dim_head=self.dim_head,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"attn_{i}")(h, training=training)
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
