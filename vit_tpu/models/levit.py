"""LeViT — conv-stem hybrid with BN-everywhere attention and learned 2-D
relative position bias (parity target: reference levit.py:164-226).

4× stride-2 conv stem (levit.py:187-192), staged transformers with a
stride-2-query "shrink" attention between stages (heads×2, dim_out=next dim —
levit.py:201-204), 1×1-conv q/k/v projections each followed by BatchNorm
(levit.py:74-98), |Δx|,|Δy|-indexed Embedding position bias (levit.py:100-117),
HardSwish conv-MLP, global-average-pool head with optional distillation head.

BatchNorm runs in the flax ``batch_stats`` collection (momentum 0.9,
eps 1e-5 — the reference's explicit settings); under data parallelism batch
stats want a cross-replica psum (SURVEY.md §7.3 item 6) — eval parity here
uses moving statistics.
"""

from __future__ import annotations

from math import ceil
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.helpers import default, exists
from vit_tpu.layers.common import Conv, Dense, gelu_exact


def cast_tuple(val, l=3):
    """Reference levit.py:18-20: right-pad with the last element."""
    val = val if isinstance(val, tuple) else (val,)
    return (*val, *((val[-1],) * max(l - len(val), 0)))


def hard_swish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def _bn(training, name):
    return nn.BatchNorm(use_running_average=not training, momentum=0.9,
                        epsilon=1e-5, name=name)


def _bn_zero_gamma(training, name):
    return nn.BatchNorm(use_running_average=not training, momentum=0.9,
                        epsilon=1e-5, scale_init=nn.initializers.zeros,
                        name=name)


class LeViTAttention(nn.Module):
    """Reference levit.py:64-139."""

    dim: int
    fmap_size: int
    heads: int = 8
    dim_key: int = 32
    dim_value: int = 64
    dropout: float = 0.0
    dim_out: Optional[int] = None
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inner_dim_key = self.dim_key * self.heads
        inner_dim_value = self.dim_value * self.heads
        dim_out = default(self.dim_out, self.dim)
        scale = self.dim_key ** -0.5
        h = self.heads

        q = Conv(inner_dim_key, (1, 1), strides=2 if self.downsample else 1,
                 use_bias=False, dtype=self.dtype, name="to_q")(x)
        q = _bn(training, "to_q_bn")(q)
        k = Conv(inner_dim_key, (1, 1), use_bias=False, dtype=self.dtype,
                 name="to_k")(x)
        k = _bn(training, "to_k_bn")(k)
        v = Conv(inner_dim_value, (1, 1), use_bias=False, dtype=self.dtype,
                 name="to_v")(x)
        v = _bn(training, "to_v_bn")(v)

        y = q.shape[1]  # output height
        q, k, v = map(
            lambda t: rearrange(t, "b ... (h d) -> b h (...) d", h=h),
            (q, k, v),
        )

        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * scale

        # learned |Δx|,|Δy| position bias (levit.py:100-117)
        fs = self.fmap_size
        q_range = np.arange(0, fs, 2 if self.downsample else 1)
        k_range = np.arange(fs)
        q_pos = np.stack(np.meshgrid(q_range, q_range, indexing="ij"),
                         axis=-1).reshape(-1, 2)
        k_pos = np.stack(np.meshgrid(k_range, k_range, indexing="ij"),
                         axis=-1).reshape(-1, 2)
        rel = np.abs(q_pos[:, None] - k_pos[None, :])
        pos_indices = rel[..., 0] * fs + rel[..., 1]  # (i, j)

        pos_bias = nn.Embed(fs * fs, h, name="pos_bias")(
            jnp.asarray(pos_indices))
        bias = rearrange(pos_bias, "i j h -> h i j")[None]
        dots = dots + bias.astype(dots.dtype) / scale

        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", y=y)

        out = gelu_exact(out)
        out = Conv(dim_out, (1, 1), dtype=self.dtype, name="to_out")(out)
        out = _bn_zero_gamma(training, "to_out_bn")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class LeViTMLP(nn.Module):
    """Conv1×1 – HardSwish – Conv1×1 (reference levit.py:48-62)."""

    dim: int
    mult: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = Conv(self.dim * self.mult, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = hard_swish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        x = Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return x


class LeViTTransformer(nn.Module):
    """Reference levit.py:141-162."""

    dim: int
    fmap_size: int
    depth: int
    heads: int
    dim_key: int
    dim_value: int
    mlp_mult: int = 2
    dropout: float = 0.0
    dim_out: Optional[int] = None
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        dim_out = default(self.dim_out, self.dim)
        attn_residual = (not self.downsample) and self.dim == dim_out
        for i in range(self.depth):
            res = x if attn_residual else 0
            x = LeViTAttention(
                self.dim, fmap_size=self.fmap_size, heads=self.heads,
                dim_key=self.dim_key, dim_value=self.dim_value,
                dropout=self.dropout, downsample=self.downsample,
                dim_out=dim_out, dtype=self.dtype, name=f"attn_{i}",
            )(x, training=training) + res
            x = LeViTMLP(dim_out, self.mlp_mult, dropout=self.dropout,
                         dtype=self.dtype, name=f"mlp_{i}")(
                x, training=training) + x
        return x


class LeViT(nn.Module):
    """Constructor parity: reference levit.py:165-177."""

    image_size: int
    num_classes: int
    dim: Union[int, Tuple[int, ...]]
    depth: Union[int, Tuple[int, ...]]
    heads: Union[int, Tuple[int, ...]]
    mlp_mult: int
    stages: int = 3
    dim_key: int = 32
    dim_value: int = 64
    dropout: float = 0.0
    num_distill_classes: Optional[int] = None
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        dims = cast_tuple(self.dim, self.stages)
        depths = cast_tuple(self.depth, self.stages)
        layer_heads = cast_tuple(self.heads, self.stages)
        assert all(len(t) == self.stages for t in (dims, depths, layer_heads)), \
            "dimensions, depths, and heads must be a tuple that is less than the designated number of stages"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False):
        dims = cast_tuple(self.dim, self.stages)
        depths = cast_tuple(self.depth, self.stages)
        layer_heads = cast_tuple(self.heads, self.stages)

        x = img
        for i, f in enumerate((32, 64, 128, dims[0])):
            x = Conv(f, (3, 3), strides=2, padding="SAME", dtype=self.dtype,
                     name=f"conv_embedding_{i}")(x)

        fmap_size = self.image_size // (2 ** 4)
        for ind, (d, dep, hs) in enumerate(zip(dims, depths, layer_heads)):
            is_last = ind == self.stages - 1
            x = LeViTTransformer(
                d, fmap_size, dep, hs, self.dim_key, self.dim_value,
                self.mlp_mult, dropout=self.dropout, dtype=self.dtype,
                name=f"stage_{ind}",
            )(x, training=training)
            if not is_last:
                x = LeViTTransformer(
                    d, fmap_size, 1, hs * 2, self.dim_key, self.dim_value,
                    dim_out=dims[ind + 1], downsample=True,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"shrink_{ind}",
                )(x, training=training)
                fmap_size = ceil(fmap_size / 2)

        x = jnp.mean(x, axis=(1, 2))  # GlobalAvgPool2D
        out = Dense(self.num_classes, dtype=self.dtype, name="mlp_head")(x)
        if exists(self.num_distill_classes):
            distill = Dense(self.num_distill_classes, dtype=self.dtype,
                            name="distill_head")(x)
            return out, distill
        return out
