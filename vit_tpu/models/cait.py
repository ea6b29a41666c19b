"""CaiT — Class-Attention in Image Transformers
(parity target: reference cait.py:155-194).

Two-stage encoder: a patch-only transformer, then a CLS-only transformer
whose attention queries the CLS token against the frozen patch context
(reference cait.py:187-190).  Per-block:
* LayerScale residual scaling with depth-dependent init epsilon
  (reference cait.py:33-48),
* talking-heads: learned heads×heads mixes both pre- and post-softmax
  (reference cait.py:97-98,123-125) — materialized-attention XLA path,
* stochastic layer dropout.  The reference draws host-side NumPy randomness
  at call time (cait.py:17-31 — non-traceable, also active at inference);
  here it is PRNG-keyed, applied only when ``training=True``, with the same
  "at least one layer survives" rule (SURVEY.md §8.10).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn

from vit_tpu.layers.common import Dense, LayerNorm, MLP
from vit_tpu.ops.attention import apply_attention
from vit_tpu.ops.patchify import patchify


def layer_scale_init(depth: int) -> float:
    """Init epsilon by block index (reference cait.py:36-41; CaiT paper §2)."""
    if depth <= 18:
        return 0.1
    if depth <= 24:
        return 1e-5
    return 1e-6


class TalkingHeadsAttention(nn.Module):
    """Reference cait.py:85-131; supports CLS→patch-context cross attention."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context: Optional[jax.Array] = None,
                 training: bool = False):
        inner_dim = self.dim_head * self.heads
        if context is None:
            ctx = x
        else:
            ctx = jnp.concatenate([x, context], axis=1)

        q = Dense(inner_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = Dense(inner_dim * 2, use_bias=False, dtype=self.dtype,
                   name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads),
            (q, k, v),
        )

        mix_pre = self.param("mix_heads_pre_attn", nn.initializers.normal(1.0),
                             (self.heads, self.heads))
        mix_post = self.param("mix_heads_post_attn", nn.initializers.normal(1.0),
                              (self.heads, self.heads))

        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * (self.dim_head ** -0.5)
        dots = jnp.einsum("bhij,hg->bgij", dots, mix_pre.astype(dots.dtype))
        attn = jax.nn.softmax(dots, axis=-1)
        attn = jnp.einsum("bhij,hg->bgij", attn, mix_post.astype(attn.dtype))

        out = apply_attention(attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class CaiTTransformer(nn.Module):
    """Reference cait.py:133-153 with PRNG layer dropout."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    layer_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context: Optional[jax.Array] = None,
                 training: bool = False):
        if self.layer_dropout > 0.0 and training:
            rng = self.make_rng("dropout")
            k1, k2 = jax.random.split(rng)
            drop = jax.random.bernoulli(k1, self.layer_dropout, (self.depth,))
            # "make sure at least one layer makes it" (cait.py:26-28)
            forced = jax.random.randint(k2, (), 0, self.depth)
            all_dropped = jnp.all(drop)
            idx = jnp.arange(self.depth)
            keep = jnp.logical_not(drop) | (all_dropped & (idx == forced))
            keep = keep.astype(x.dtype)
        else:
            keep = jnp.ones((self.depth,), x.dtype)

        for i in range(self.depth):
            scale_a = self.param(
                f"layerscale_attn_{i}",
                nn.initializers.constant(layer_scale_init(i + 1)),
                (1, 1, self.dim),
            )
            scale_f = self.param(
                f"layerscale_mlp_{i}",
                nn.initializers.constant(layer_scale_init(i + 1)),
                (1, 1, self.dim),
            )
            h = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")(x)
            h = TalkingHeadsAttention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, dtype=self.dtype, name=f"attn_{i}",
            )(h, context=context, training=training)
            x = x + keep[i] * (h * scale_a.astype(h.dtype))
            h = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}")(x)
            h = MLP(self.dim, self.mlp_dim, dropout=self.dropout,
                    dtype=self.dtype, name=f"mlp_{i}")(h, training=training)
            x = x + keep[i] * (h * scale_f.astype(h.dtype))
        return x


class CaiT(nn.Module):
    """Constructor parity: reference cait.py:156-157."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    cls_depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    layer_dropout: float = 0.0
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        assert self.image_size % self.patch_size == 0, \
            "Image dimensions must be divisible by the patch size."

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        num_patches = (self.image_size // self.patch_size) ** 2

        x = patchify(img, self.patch_size, self.patch_size)
        x = Dense(self.dim, dtype=self.dtype, name="patch_embedding")(x)
        b, n, _ = x.shape

        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches, self.dim))
        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))

        x = x + pos_embedding[:, :n].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)

        x = CaiTTransformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            dropout=self.dropout, layer_dropout=self.layer_dropout,
            dtype=self.dtype, name="patch_transformer",
        )(x, training=training)

        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        cls_out = CaiTTransformer(
            self.dim, self.cls_depth, self.heads, self.dim_head, self.mlp_dim,
            dropout=self.dropout, layer_dropout=self.layer_dropout,
            dtype=self.dtype, name="cls_transformer",
        )(cls_tokens, context=x, training=training)

        out = LayerNorm(dtype=self.dtype, name="head_norm")(cls_out[:, 0])
        out = Dense(self.num_classes, dtype=self.dtype, name="head")(out)
        return out
