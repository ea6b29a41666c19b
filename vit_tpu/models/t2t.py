"""T2T-ViT — Tokens-to-Token progressive tokenization
(parity target: reference t2t.py:49-109).

Each T2T stage unfolds the token map with ``extract_patches`` (TF-'SAME'
padding semantics — reference t2t.py:42; the reference's pad=stride//2 length
formula agrees with 'SAME' on its canonical configs and 'SAME' is what the TF
code actually executes, SURVEY.md §8.9) and runs a single-head transformer
whose dim equals the unfolded channel count (reference t2t.py:67-68 — with
heads=1, dim_head=dim the attention output projection is skipped).  Grid
sizes are derived analytically — no runtime shape probe.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn

from vit_tpu.layers.common import Dense, LayerNorm, Transformer
from vit_tpu.ops.patchify import extract_patches


def same_output_size(size: int, stride: int) -> int:
    """TF 'SAME' output length: ceil(size / stride)."""
    return -(-size // stride)


class T2TViT(nn.Module):
    """Constructor parity: reference t2t.py:50-52."""

    image_size: int
    num_classes: int
    dim: int
    depth: Optional[int] = None
    heads: Optional[int] = None
    mlp_dim: Optional[int] = None
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    transformer: Optional[nn.Module] = None
    t2t_layers: Tuple[Tuple[int, int], ...] = ((7, 4), (3, 2), (3, 2))
    dtype: Any = jnp.float32
    scan_layers: bool = False

    def __post_init__(self):
        super().__post_init__()
        assert self.pool in {"cls", "mean"}, \
            "pool type must be either cls (cls token) or mean (mean pooling)"
        if self.transformer is None:
            assert all(v is not None for v in
                       (self.depth, self.heads, self.mlp_dim)), \
                "depth, heads, and mlp_dim must be supplied"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        layer_dim = self.channels
        output_image_size = self.image_size

        x = img
        for i, (kernel_size, stride) in enumerate(self.t2t_layers):
            layer_dim *= kernel_size ** 2
            is_first = i == 0
            is_last = i == len(self.t2t_layers) - 1
            if not is_first:
                h = int(math.sqrt(x.shape[1]))
                x = rearrange(x, "b (h w) c -> b h w c", h=h)
            x = extract_patches(x, kernel_size, stride, padding="SAME")
            x = rearrange(x, "b h w c -> b (h w) c")
            output_image_size = same_output_size(output_image_size, stride)
            if not is_last:
                # single-head transformer at the unfolded dim (t2t.py:67-68)
                x = Transformer(
                    dim=layer_dim, depth=1, heads=1, dim_head=layer_dim,
                    mlp_dim=layer_dim, dropout=self.dropout, dtype=self.dtype,
                    name=f"t2t_transformer_{i}",
                )(x, training=training)

        x = Dense(self.dim, dtype=self.dtype, name="patch_embedding")(x)
        b, n, _ = x.shape
        num_patches = output_image_size ** 2

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches + 1, self.dim))
        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos_embedding[:, : (n + 1)].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)

        if self.transformer is not None:
            x = self.transformer(x, training=training)
        elif self.scan_layers:
            from vit_tpu.layers.scan import ScannedTransformer

            x = ScannedTransformer(
                self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
                dropout=self.dropout, dtype=self.dtype, name="transformer",
            )(x, training=training)
        else:
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
