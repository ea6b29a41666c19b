"""PiT — Pooling-based Vision Transformer
(parity target: reference pit.py:158-219).

Overlapping-patch tokenizer (stride = patch_size//2, VALID unfold —
reference pit.py:110-122,180), staged transformer with depthwise-conv token
pooling that doubles the dim between stages (reference pit.py:140-156).

Divergence (SURVEY.md §8.4): the reference's ``not_last = ind < (len(depth)
< 1)`` (pit.py:194) is always False, so its ``Pool`` never runs and the dim
never doubles.  Here pooling fires after every non-final stage, as in the
paper; the parity suite compares against a patched reference with the same
fix.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn

from vit_tpu.core.helpers import cast_tuple
from vit_tpu.layers.common import (Conv, Dense, GroupedConv, LayerNorm,
                                   Transformer, glorot_uniform)


def conv_output_size(image_size: int, kernel_size: int, stride: int,
                     padding: int = 0) -> int:
    return int((image_size - kernel_size + 2 * padding) / stride) + 1


class OverlapPatchEmbed(nn.Module):
    """``extract_patches(k, s, VALID) → flatten → Dense(dim)`` folded into
    one strided conv (reference pit.py:110-122, 180-184).

    The unfold's channel order (patch rows contiguous, each row holding
    ``kernel·c`` values — ``ops/patchify.extract_patches``) is exactly the
    HWIO reshape of the Dense kernel, so ``conv(img, W.reshape(k,k,c,dim),
    stride=s, VALID) + b`` computes the same embedding without ever
    materializing the (b, 31, 31, 588) unfold — whose 196-slice concat
    profiled at 6.7 ms/step = 15% of the PiT step (profiles/pit.md).
    The param tree matches Dense (``kernel (k·k·c, dim)``, ``bias (dim,)``)
    so TF transplant and golden parity are unchanged.
    """

    dim: int
    patch_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        k, s = self.patch_size, self.stride
        c = img.shape[-1]
        kernel = self.param("kernel", glorot_uniform, (k * k * c, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        img, kernel, bias = nn.dtypes.promote_dtype(
            img, kernel, bias, dtype=self.dtype)
        out = jax.lax.conv_general_dilated(
            img, kernel.reshape(k, k, c, self.dim), (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + bias
        return rearrange(out, "b h w c -> b (h w) c")


class Pool(nn.Module):
    """Reference pit.py:140-156: grouped 3×3/s2 conv + pointwise conv on the
    spatial tokens (dim → 2·dim), Dense on the CLS token."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        cls_token, tokens = x[:, :1], x[:, 1:]
        cls_token = Dense(self.dim * 2, dtype=self.dtype, name="cls_ff")(cls_token)

        h = int(math.sqrt(tokens.shape[1]))
        fmap = rearrange(tokens, "b (h w) c -> b h w c", h=h)
        # Keras Conv2D(filters=2·dim, groups=dim): each group maps 1 input
        # channel to 2 outputs (pit.py:130).
        fmap = GroupedConv(self.dim * 2, (3, 3), strides=2, padding="SAME",
                           dtype=self.dtype,
                           name="downsample_grouped")(fmap)
        fmap = Conv(self.dim * 2, (1, 1), dtype=self.dtype,
                    name="downsample_pointwise")(fmap)
        tokens = rearrange(fmap, "b h w c -> b (h w) c")
        return jnp.concatenate([cls_token, tokens], axis=1)


class PiT(nn.Module):
    """Constructor parity: reference pit.py:159-170."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: Tuple[int, ...]
    heads: Any
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Any = jnp.float32
    scan_layers: bool = False

    def __post_init__(self):
        super().__post_init__()
        assert self.image_size % self.patch_size == 0, \
            "Image dimensions must be divisible by the patch size."
        assert isinstance(self.depth, tuple), (
            "depth must be a tuple of integers, specifying the number of "
            "blocks before each downsizing"
        )

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        heads = cast_tuple(self.heads, len(self.depth))

        x = OverlapPatchEmbed(self.dim, self.patch_size,
                              self.patch_size // 2, dtype=self.dtype,
                              name="patch_embedding")(img)
        b, n, _ = x.shape

        output_size = conv_output_size(self.image_size, self.patch_size,
                                       self.patch_size // 2)
        num_patches = output_size ** 2

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches + 1, self.dim))
        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos_embedding[:, : (n + 1)].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)

        dim = self.dim
        for ind, (layer_depth, layer_heads) in enumerate(zip(self.depth, heads)):
            if self.scan_layers:
                from vit_tpu.layers.scan import ScannedTransformer

                x = ScannedTransformer(
                    dim, layer_depth, layer_heads, self.dim_head,
                    self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
                    name=f"transformer_{ind}",
                )(x, training=training)
            else:
                x = Transformer(
                    dim, layer_depth, layer_heads, self.dim_head,
                    self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
                    name=f"transformer_{ind}",
                )(x, training=training)
            if ind < len(self.depth) - 1:  # paper-correct pooling (§8.4)
                x = Pool(dim, dtype=self.dtype, name=f"pool_{ind}")(
                    x, training=training)
                dim *= 2

        x = LayerNorm(dtype=self.dtype, name="head_norm")(x[:, 0])
        x = Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
