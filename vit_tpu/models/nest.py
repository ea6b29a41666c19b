"""NesT — nested hierarchical transformer
(parity target: reference nest.py:150-216).

The image is folded into 4^level independent blocks via a batch-dim
rearrange (nest.py:209), each block runs a transformer with an additive
learned 1-D positional embedding broadcast over channels (nest.py:129,
140-142), then blocks unfold and a conv/LayerNorm/maxpool ``Aggregate``
halves the block count (nest.py:111-123).
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.helpers import cast_tuple
from vit_tpu.layers.common import (ChannelLayerNorm, Conv, Dense,
                                   fused_conv_mlp_residual, gelu_exact,
                                   windowed_attention_eligible)


def _fused_nest_attention_residual(x, norm, attn, mode, training):
    """``x + NesTAttention(ChannelLN(x))`` through the fused attention
    block, or ``None`` when the gate declines.  Blocks are already folded
    into the batch axis at model level (nest.py:209), so the (G, h·w, c)
    view is a pure bitcast — no relayout enters the kernel boundary."""
    from vit_tpu.ops.fused_attention_block import fused_attention_block

    b, h, w, c = x.shape
    heads = attn.heads
    dim_head = c // heads
    n = h * w
    if not windowed_attention_eligible((b, n, c), x.dtype, attn.dropout,
                                       training, attn.dtype, mode):
        return None
    inner = heads * dim_head
    dummy = jnp.zeros((1, 1, 1, c), x.dtype)
    norm(dummy)
    attn(dummy)
    np_ = norm.variables["params"]
    ap = attn.variables["params"]
    yw = fused_attention_block(
        x.reshape(b, n, c),
        np_["g"].reshape(-1).astype(jnp.float32),
        np_["b"].reshape(-1).astype(jnp.float32),
        ap["to_qkv"]["kernel"].reshape(c, 3 * inner).astype(x.dtype),
        ap["to_out"]["kernel"].reshape(inner, c).astype(x.dtype),
        ap["to_out"]["bias"].astype(x.dtype),
        heads, dim_head, None, norm.eps, mode == "interpret")
    return yw.reshape(b, h, w, c)


class NesTAttention(nn.Module):
    """Reference nest.py:77-109: dim_head = dim // heads, conv1×1 qkv."""

    dim: int
    heads: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        heads = self.heads
        dim_head = self.dim // heads
        inner_dim = dim_head * heads

        qkv = Conv(inner_dim * 3, (1, 1), use_bias=False, dtype=self.dtype,
                   name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b x y (h d) -> b h (x y) d", h=heads),
            (q, k, v),
        )
        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * (dim_head ** -0.5)
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=h, y=w)
        out = Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class NesTTransformer(nn.Module):
    """Reference nest.py:125-148."""

    dim: int
    seq_len: int
    depth: int
    heads: int
    mlp_mult: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: str = "auto"
    fused_mlp: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool = False):
        _, h, w, c = x.shape
        pos_emb = self.param("pos_emb", nn.initializers.normal(1.0),
                             (self.seq_len,))
        pe = rearrange(pos_emb[: h * w], "(h w) -> () h w ()", h=h, w=w)
        x = x + pe.astype(x.dtype)

        for i in range(self.depth):
            norm = ChannelLayerNorm(self.dim, name=f"attn_norm_{i}")
            attn = NesTAttention(self.dim, heads=self.heads,
                                 dropout=self.dropout, dtype=self.dtype,
                                 name=f"attn_{i}")
            y = (_fused_nest_attention_residual(
                    x, norm, attn, self.fused_attention, training)
                 if self.fused_attention != "never" else None)
            x = y if y is not None else x + attn(norm(x), training=training)

            mlp_norm = ChannelLayerNorm(self.dim, name=f"mlp_norm_{i}")
            fc1 = Conv(self.dim * self.mlp_mult, (1, 1), dtype=self.dtype,
                       name=f"mlp_fc1_{i}")
            fc2 = Conv(self.dim, (1, 1), dtype=self.dtype,
                       name=f"mlp_fc2_{i}")
            y = fused_conv_mlp_residual(x, mlp_norm, None, self.dropout,
                                        training, self.dtype,
                                        self.fused_mlp, fc1=fc1, fc2=fc2)
            if y is not None:
                x = y
            else:
                hdn = mlp_norm(x)
                hdn = fc1(hdn)
                hdn = gelu_exact(hdn)
                hdn = nn.Dropout(self.dropout)(hdn,
                                               deterministic=not training)
                hdn = fc2(hdn)
                hdn = nn.Dropout(self.dropout)(hdn,
                                               deterministic=not training)
                x = x + hdn
        return x


class NesT(nn.Module):
    """Constructor parity: reference nest.py:151-161."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    heads: int
    num_hierarchies: int
    block_repeats: Union[int, Tuple[int, ...]]
    mlp_mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: str = "auto"
    fused_mlp: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        assert self.image_size % self.patch_size == 0, \
            "Image dimensions must be divisible by the patch size."

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        fmap_size = self.image_size // self.patch_size
        blocks = 2 ** (self.num_hierarchies - 1)
        seq_len = (fmap_size // blocks) ** 2
        hierarchies = list(reversed(range(self.num_hierarchies)))
        mults = [2 ** i for i in reversed(hierarchies)]
        layer_heads = [m * self.heads for m in mults]
        layer_dims = [m * self.dim for m in mults]
        last_dim = layer_dims[-1]
        layer_dims = [*layer_dims, layer_dims[-1]]
        dim_pairs = list(zip(layer_dims[:-1], layer_dims[1:]))
        block_repeats = cast_tuple(self.block_repeats, self.num_hierarchies)

        x = rearrange(img, "b (h p1) (w p2) c -> b h w (p1 p2 c)",
                      p1=self.patch_size, p2=self.patch_size)
        x = Conv(layer_dims[0], (1, 1), dtype=self.dtype,
                 name="patch_embedding")(x)

        for idx, (level, heads, (dim_in, dim_out), depth) in enumerate(
                zip(hierarchies, layer_heads, dim_pairs, block_repeats)):
            is_last = level == 0
            block_size = 2 ** level
            x = rearrange(x, "b (b1 h) (b2 w) c -> (b b1 b2) h w c",
                          b1=block_size, b2=block_size)
            x = NesTTransformer(dim_in, seq_len, depth, heads, self.mlp_mult,
                                dropout=self.dropout, dtype=self.dtype,
                                fused_attention=self.fused_attention,
                                fused_mlp=self.fused_mlp,
                                name=f"transformer_{idx}")(
                x, training=training)
            x = rearrange(x, "(b b1 b2) h w c -> b (b1 h) (b2 w) c",
                          b1=block_size, b2=block_size)
            if not is_last:
                x = Conv(dim_out, (3, 3), padding="SAME", dtype=self.dtype,
                         name=f"aggregate_conv_{idx}")(x)
                x = ChannelLayerNorm(dim_out, name=f"aggregate_norm_{idx}")(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        x = ChannelLayerNorm(last_dim, name="head_norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)
