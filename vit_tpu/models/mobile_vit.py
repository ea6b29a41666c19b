"""MobileViT — MobileNetV2 trunk interleaved with transformer blocks
(parity target: reference mobile_vit.py:209-271).

MV2 inverted-residual blocks (BN momentum 0.9 / eps 1e-5 + Swish,
mobile_vit.py:130-170) interleave with MobileViT blocks: conv local
representation → patch-unfold to a ``b (ph pw) (h w) d`` 4-D token layout →
transformer over the token axis (mobile_vit.py:99-104) → fold back →
concat-fusion conv.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.layers.common import Conv, Dense, GroupedConv, LayerNorm


def swish(x):
    return jax.nn.silu(x)


class ConvNxNBN(nn.Module):
    """Conv(no bias) → BN(0.9, 1e-5) → Swish (reference mobile_vit.py:37-49)."""

    dim: int
    kernel_size: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = Conv(self.dim, (self.kernel_size, self.kernel_size),
                 strides=self.stride, padding="SAME", use_bias=False,
                 dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return swish(x)


class MV2Block(nn.Module):
    """MobileNetV2 inverted residual (reference mobile_vit.py:130-170)."""

    dim_in: int
    dim_out: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.stride in (1, 2)
        hidden_dim = int(self.dim_in * self.expansion)
        use_res = self.stride == 1 and self.dim_in == self.dim_out

        def bn(name):
            return nn.BatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5, name=name)

        out = x
        if self.expansion != 1:
            out = Conv(hidden_dim, (1, 1), use_bias=False, dtype=self.dtype,
                       name="pw")(out)
            out = bn("pw_bn")(out)
            out = swish(out)
        out = GroupedConv(hidden_dim, (3, 3), strides=self.stride,
                          padding="SAME", use_bias=False,
                   dtype=self.dtype, name="dw")(out)
        out = bn("dw_bn")(out)
        out = swish(out)
        out = Conv(self.dim_out, (1, 1), use_bias=False, dtype=self.dtype,
                   name="pw_linear")(out)
        out = bn("pw_linear_bn")(out)
        if use_res:
            out = out + x
        return out


class MobileViTAttention(nn.Module):
    """Attention over the 4-D token layout b p n d (mobile_vit.py:79-107)."""

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
            lambda t: rearrange(t, "b p n (h d) -> b p h n d", h=self.heads),
            (q, k, v),
        )
        dots = jnp.einsum("bphid,bphjd->bphij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bphij,bphjd->bphid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = rearrange(out, "b p h n d -> b p n (h d)")
        out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class MobileViTBlock(nn.Module):
    """Reference mobile_vit.py:173-206."""

    dim: int
    depth: int
    channel: int
    kernel_size: int
    patch_size: Tuple[int, int]
    mlp_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ph, pw = self.patch_size
        y = x

        x = ConvNxNBN(self.channel, self.kernel_size, dtype=self.dtype,
                      name="conv1")(x, training=training)
        x = ConvNxNBN(self.dim, 1, dtype=self.dtype, name="conv2")(
            x, training=training)

        _, h, w, _ = x.shape
        x = rearrange(x, "b (h ph) (w pw) d -> b (ph pw) (h w) d",
                      ph=ph, pw=pw)
        for i in range(self.depth):
            hdn = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")(x)
            hdn = MobileViTAttention(self.dim, heads=4, dim_head=8,
                                     dropout=self.dropout, dtype=self.dtype,
                                     name=f"attn_{i}")(hdn, training=training)
            x = x + hdn
            hdn = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}")(x)
            hdn = Dense(self.mlp_dim, dtype=self.dtype,
                        name=f"mlp_fc1_{i}")(hdn)
            hdn = swish(hdn)
            hdn = nn.Dropout(self.dropout)(hdn, deterministic=not training)
            hdn = Dense(self.dim, dtype=self.dtype, name=f"mlp_fc2_{i}")(hdn)
            hdn = nn.Dropout(self.dropout)(hdn, deterministic=not training)
            x = x + hdn
        x = rearrange(x, "b (ph pw) (h w) d -> b (h ph) (w pw) d",
                      h=h // ph, w=w // pw, ph=ph, pw=pw)

        x = ConvNxNBN(self.channel, 1, dtype=self.dtype, name="conv3")(
            x, training=training)
        x = jnp.concatenate([x, y], axis=-1)
        x = ConvNxNBN(self.channel, self.kernel_size, dtype=self.dtype,
                      name="conv4")(x, training=training)
        return x


class MobileViT(nn.Module):
    """Constructor parity: reference mobile_vit.py:210-219."""

    image_size: Tuple[int, int]
    dims: Sequence[int]
    channels: Sequence[int]
    num_classes: int
    expansion: int = 4
    kernel_size: int = 3
    patch_size: Tuple[int, int] = (2, 2)
    depths: Tuple[int, int, int] = (2, 4, 3)
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        assert len(self.dims) == 3, "dims must be a tuple of 3"
        assert len(self.depths) == 3, "depths must be a tuple of 3"
        ih, iw = self.image_size
        ph, pw = self.patch_size
        assert ih % ph == 0 and iw % pw == 0

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        ch = list(self.channels)
        x = ConvNxNBN(ch[0], 3, stride=2, dtype=self.dtype, name="conv1")(
            x, training=training)

        stem_cfg = [(ch[0], ch[1], 1), (ch[1], ch[2], 2),
                    (ch[2], ch[3], 1), (ch[2], ch[3], 1)]
        for i, (din, dout, st) in enumerate(stem_cfg):
            x = MV2Block(din, dout, stride=st, expansion=self.expansion,
                         dtype=self.dtype, name=f"stem_{i}")(
                x, training=training)

        trunk_cfg = [
            (ch[3], ch[4], self.dims[0], self.depths[0], ch[5],
             int(self.dims[0] * 2)),
            (ch[5], ch[6], self.dims[1], self.depths[1], ch[7],
             int(self.dims[1] * 4)),
            (ch[7], ch[8], self.dims[2], self.depths[2], ch[9],
             int(self.dims[2] * 4)),
        ]
        for i, (din, dout, dim, depth, channel, mlp_dim) in enumerate(trunk_cfg):
            x = MV2Block(din, dout, stride=2, expansion=self.expansion,
                         dtype=self.dtype, name=f"trunk_conv_{i}")(
                x, training=training)
            x = MobileViTBlock(dim, depth, channel, self.kernel_size,
                               self.patch_size, mlp_dim, dtype=self.dtype,
                               name=f"trunk_attn_{i}")(x, training=training)

        x = ConvNxNBN(ch[-1], 1, dtype=self.dtype, name="to_logits_conv")(
            x, training=training)
        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, use_bias=False, dtype=self.dtype,
                     name="head")(x)
