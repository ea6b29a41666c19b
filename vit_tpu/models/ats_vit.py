"""ATS-ViT — Adaptive Token Sampling ViT
(parity target: reference ats_vit.py:260-318; ATS core :71-132).

The reference's sampling is jit-hostile by design: per-sample ``tf.unique``
in a Python loop, host-side ``pad_sequences``, data-dependent widths
(ats_vit.py:108-116 — SURVEY.md §3.5).  Here the shapes stay STATIC: all
``output_num_tokens`` slots are kept, duplicates are removed by a sort-based
dedup (sort sampled ids, zero out ids equal to their predecessor, re-sort so
zeros lead — reproducing the reference's "unique, sorted-ascending,
zero-padded-in-front" layout), and the boolean mask carries padding through
the remaining layers.  The ``return_sampled_token_ids`` contract is kept
(ids with -1 padding, ats_vit.py:313-316) at the static width
``max_tokens_per_depth[-1]`` instead of the reference's data-dependent width.

Gumbel sampling uses an ``'ats'`` PRNG collection when provided
(``rngs={'ats': key}``); otherwise a fixed key keeps inference
deterministic (the reference samples with fresh host RNG even at eval).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn

from vit_tpu.core.helpers import pair
from vit_tpu.layers.common import (Dense, LayerNorm, MLP,
                                   fused_mlp_residual)
from vit_tpu.ops.patchify import patchify

MASK_VALUE = -jnp.finfo(jnp.float32).max
HALF_MASK_VALUE = MASK_VALUE / 2


def log(t, eps=1e-6):
    return jnp.log(t + eps)


def sample_gumbel(key, shape, eps=1e-6):
    u = jax.random.uniform(key, shape)
    return -log(-log(u, eps), eps)


def adaptive_token_sampling(attn, value, mask, output_num_tokens: int,
                            key, eps=1e-6):
    """Static-shape ATS (reference ats_vit.py:71-132 semantics).

    Returns (new_attn (b,h,k+1,n), new_mask (b,k+1), ids (b,k+1)) where slot
    0 is the CLS row and padding slots have id 0 / mask False.
    """
    heads = attn.shape[1]

    cls_attn = attn[..., 0, 1:]                       # (b, h, n-1)
    value_norms = jnp.linalg.norm(value[..., 1:, :], axis=-1)
    cls_attn = jnp.einsum("bhn,bhn->bn", cls_attn, value_norms)
    normed = cls_attn / (jnp.sum(cls_attn, axis=-1, keepdims=True) + eps)

    pseudo_logits = log(normed)
    mask_without_cls = mask[:, 1:]
    pseudo_logits = jnp.where(mask_without_cls, pseudo_logits, HALF_MASK_VALUE)

    pseudo_logits = repeat(pseudo_logits, "b n -> b k n", k=output_num_tokens)
    pseudo_logits = pseudo_logits + sample_gumbel(key, pseudo_logits.shape)

    # gumbel-max; +1 reserves id 0 for the CLS slot / padding
    sampled = jnp.argmax(pseudo_logits, axis=-1) + 1   # (b, k)

    # sort-based static dedup: duplicates → 0, zeros sort to the front,
    # valid unique ids ascending at the end (matches pad_sequences 'pre')
    s = jnp.sort(sampled, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(s[:, :1], bool), s[:, 1:] == s[:, :-1]], axis=-1)
    s = jnp.where(dup, 0, s)
    unique_ids = jnp.sort(s, axis=-1)                  # (b, k)

    new_mask = unique_ids != 0
    new_mask = jnp.pad(new_mask, ((0, 0), (1, 0)), constant_values=True)
    ids = jnp.pad(unique_ids, ((0, 0), (1, 0)))        # (b, k+1), CLS id 0

    # gather attention rows for the sampled queries
    new_attn = jnp.take_along_axis(
        attn, ids[:, None, :, None], axis=2)           # (b, h, k+1, n)
    return new_attn, new_mask, ids


class ATSAttention(nn.Module):
    """Reference ats_vit.py:173-220."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    output_num_tokens: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        num_tokens = x.shape[1]
        inner_dim = self.dim_head * self.heads

        qkv = Dense(inner_dim * 3, use_bias=False, dtype=self.dtype,
                    name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads),
            (q, k, v),
        )

        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * (self.dim_head ** -0.5)
        if mask is not None:
            dots_mask = mask[:, None, :, None] & mask[:, None, None, :]
            dots = jnp.where(dots_mask, dots, MASK_VALUE)

        attn = jax.nn.softmax(dots, axis=-1)

        sampled_token_ids = None
        if self.output_num_tokens is not None and \
                (num_tokens - 1) > self.output_num_tokens:
            if self.has_rng("ats"):
                key = self.make_rng("ats")
            else:
                key = jax.random.PRNGKey(0)
            attn, mask, sampled_token_ids = adaptive_token_sampling(
                attn, v, mask, self.output_num_tokens, key)

        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out, mask, sampled_token_ids


class ATSTransformer(nn.Module):
    """Reference ats_vit.py:222-258."""

    dim: int
    depth: int
    max_tokens_per_depth: Tuple[int, ...]
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_mlp: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        assert len(self.max_tokens_per_depth) == self.depth, \
            "max_tokens_per_depth must be a tuple of length that is equal to the depth of the transformer"
        assert sorted(self.max_tokens_per_depth, reverse=True) == \
            list(self.max_tokens_per_depth), \
            "max_tokens_per_depth must be in decreasing order"
        assert min(self.max_tokens_per_depth) > 0, \
            "max_tokens_per_depth must have at least 1 token at any layer"

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, n = x.shape[:2]
        mask = jnp.ones((b, n), bool)
        token_ids = repeat(jnp.arange(n), "n -> b n", b=b)

        for i, output_num_tokens in enumerate(self.max_tokens_per_depth):
            normed = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")(x)
            attn_out, mask, sampled_token_ids = ATSAttention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, output_num_tokens=output_num_tokens,
                dtype=self.dtype, name=f"attn_{i}",
            )(normed, mask=mask, training=training)

            if sampled_token_ids is not None:
                x = jnp.take_along_axis(x, sampled_token_ids[..., None], axis=1)
                token_ids = jnp.take_along_axis(token_ids, sampled_token_ids,
                                                axis=1)

            x = x + attn_out
            norm = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}")
            mlp = MLP(self.dim, self.mlp_dim, dropout=self.dropout,
                      dtype=self.dtype, name=f"mlp_{i}")
            x = fused_mlp_residual(x, norm, mlp, self.dropout, training,
                                   self.dtype, self.fused_mlp)
        return x, token_ids


class ViT(nn.Module):
    """Constructor parity: reference ats_vit.py:261-273."""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    max_tokens_per_depth: Tuple[int, ...]
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Any = jnp.float32
    # Default "never": with adaptive token sampling only the first two
    # layers sit in the fused-MLP window (n=257, 129) and the kernel
    # boundaries around the sampling gathers cost more than they save
    # (measured: 4332 -> 4153 img/s infer at the canonical config).
    fused_mlp: str = "never"

    def __post_init__(self):
        super().__post_init__()
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        assert ih % ph == 0 and iw % pw == 0, \
            "Image dimensions must be divisible by the patch size."

    @nn.compact
    def __call__(self, img: jax.Array, return_sampled_token_ids: bool = False,
                 training: bool = False):
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

        x, token_ids = ATSTransformer(
            self.dim, self.depth, self.max_tokens_per_depth, self.heads,
            self.dim_head, self.mlp_dim, dropout=self.dropout,
            dtype=self.dtype, fused_mlp=self.fused_mlp, name="transformer",
        )(x, training=training)

        logits = Dense(self.num_classes, dtype=self.dtype, name="head")(
            LayerNorm(dtype=self.dtype, name="head_norm")(x[:, 0]))

        if return_sampled_token_ids:
            # remove CLS slot; -1 marks padding (ats_vit.py:313-316)
            token_ids = token_ids[:, 1:] - 1
            return logits, token_ids
        return logits
