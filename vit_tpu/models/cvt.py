"""CvT — Convolutional vision Transformer
(parity target: reference cvt.py:149-202).

3 conv-embed stages configured by ``s{1,2,3}_*`` kwargs (reference
cvt.py:180-185 harvests them from ``locals()`` — here they are explicit
dataclass fields grouped with the same helper).  Attention q/k/v are
depthwise-conv projections (depthwise+BN+pointwise, reference cvt.py:79-92)
with strided k/v; heads fold into the batch dim (cvt.py:118); norms are the
shared biased-variance channel LayerNorm (cvt.py:30-43).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.layers.common import (ChannelLayerNorm, Conv, Dense,
                                   GroupedConv, gelu_exact)
from vit_tpu.ops.attention import scaled_dot_product_attention


class CvTDepthWiseConv2d(nn.Module):
    """Reference cvt.py:79-92: depthwise conv → BN(0.9, 1e-5) → pointwise."""

    dim_in: int
    dim_out: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = GroupedConv(self.dim_in, (self.kernel_size, self.kernel_size),
                 strides=self.stride, padding="SAME",
                 use_bias=self.use_bias,
                 dtype=self.dtype, name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        x = Conv(self.dim_out, (1, 1), use_bias=self.use_bias,
                 dtype=self.dtype, name="pointwise")(x)
        return x


class CvTAttention(nn.Module):
    """Reference cvt.py:94-127."""

    dim: int
    proj_kernel: int
    kv_proj_stride: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inner_dim = self.dim_head * self.heads
        h = self.heads
        y = x.shape[2]  # width of the q map

        q = CvTDepthWiseConv2d(self.dim, inner_dim, self.proj_kernel,
                               stride=1, use_bias=False, dtype=self.dtype,
                               name="to_q")(x, training=training)
        kv = CvTDepthWiseConv2d(self.dim, inner_dim * 2, self.proj_kernel,
                                stride=self.kv_proj_stride, use_bias=False,
                                dtype=self.dtype, name="to_kv")(
            x, training=training)
        k, v = jnp.split(kv, 2, axis=-1)

        q, k, v = map(
            lambda t: rearrange(t, "b x y (h d) -> b h (x y) d", h=h),
            (q, k, v),
        )
        # flash dispatch at large n (stage-1 q is 3136 tokens @224 with
        # stride-2-reduced k/v — the f32 (b, n, n_k) maps are the HBM
        # bottleneck); small n / f32 keep the exact XLA parity math.
        out = scaled_dot_product_attention(q, k, v,
                                           scale=self.dim_head ** -0.5)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", y=y)

        out = Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class CvTTransformer(nn.Module):
    """Reference cvt.py:129-147 — pre-norm with channel LayerNorm over NHWC."""

    dim: int
    proj_kernel: int
    kv_proj_stride: int
    depth: int
    heads: int
    dim_head: int = 64
    mlp_mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i in range(self.depth):
            h = ChannelLayerNorm(self.dim, name=f"attn_norm_{i}")(x)
            h = CvTAttention(self.dim, self.proj_kernel, self.kv_proj_stride,
                             heads=self.heads, dim_head=self.dim_head,
                             dropout=self.dropout, dtype=self.dtype,
                             name=f"attn_{i}")(h, training=training)
            x = x + h
            h = ChannelLayerNorm(self.dim, name=f"mlp_norm_{i}")(x)
            h = Conv(self.dim * self.mlp_mult, (1, 1), dtype=self.dtype,
                     name=f"mlp_fc1_{i}")(h)
            h = gelu_exact(h)
            h = nn.Dropout(self.dropout)(h, deterministic=not training)
            h = Conv(self.dim, (1, 1), dtype=self.dtype,
                     name=f"mlp_fc2_{i}")(h)
            h = nn.Dropout(self.dropout)(h, deterministic=not training)
            x = x + h
        return x


class CvT(nn.Module):
    """Constructor parity: reference cvt.py:150-177."""

    num_classes: int
    s1_emb_dim: int = 64
    s1_emb_kernel: int = 7
    s1_emb_stride: int = 4
    s1_proj_kernel: int = 3
    s1_kv_proj_stride: int = 2
    s1_heads: int = 1
    s1_depth: int = 1
    s1_mlp_mult: int = 4
    s2_emb_dim: int = 192
    s2_emb_kernel: int = 3
    s2_emb_stride: int = 2
    s2_proj_kernel: int = 3
    s2_kv_proj_stride: int = 2
    s2_heads: int = 3
    s2_depth: int = 2
    s2_mlp_mult: int = 4
    s3_emb_dim: int = 384
    s3_emb_kernel: int = 3
    s3_emb_stride: int = 2
    s3_proj_kernel: int = 3
    s3_kv_proj_stride: int = 2
    s3_heads: int = 6
    s3_depth: int = 10
    s3_mlp_mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        x = img
        for prefix in ("s1", "s2", "s3"):
            cfg = {name: getattr(self, f"{prefix}_{name}") for name in
                   ("emb_dim", "emb_kernel", "emb_stride", "proj_kernel",
                    "kv_proj_stride", "heads", "depth", "mlp_mult")}
            x = Conv(cfg["emb_dim"], (cfg["emb_kernel"], cfg["emb_kernel"]),
                     strides=cfg["emb_stride"], padding="SAME",
                     dtype=self.dtype, name=f"{prefix}_emb")(x)
            x = ChannelLayerNorm(cfg["emb_dim"], name=f"{prefix}_norm")(x)
            x = CvTTransformer(
                dim=cfg["emb_dim"], proj_kernel=cfg["proj_kernel"],
                kv_proj_stride=cfg["kv_proj_stride"], depth=cfg["depth"],
                heads=cfg["heads"], mlp_mult=cfg["mlp_mult"],
                dropout=self.dropout, dtype=self.dtype,
                name=f"{prefix}_transformer",
            )(x, training=training)

        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)
