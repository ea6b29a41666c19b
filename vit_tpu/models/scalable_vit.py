"""ScalableViT — Scalable Self-Attention + Interactive Windowed
Self-Attention (parity target: reference scalable_vit.py:250-319).

SSA reduces k/v spatially with kernel=stride=r convs and decoupled key/value
dims (scalable_vit.py:104-143); IWSA adds a 3×3-conv Local Interactive
Module residual on v (scalable_vit.py:145-198); PEG after the first block of
each stage.

Divergence (SURVEY.md §8.3): the reference builds blocks in order
[ssa, ff, peg, ff, iwsa] but unpacks them as [ssa, ff, peg, iwsa, ff], so it
executes SSA→FF→FF→IWSA.  Here blocks run in the paper order
SSA→FF→(PEG)→IWSA→FF; the parity suite compares against a reference patched
the same way.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.helpers import cast_tuple, default
from vit_tpu.layers.common import (ChannelLayerNorm, Conv, Dense,
                                   GroupedConv, LayerNorm,
                                   fused_conv_mlp_residual, gelu_exact)
from vit_tpu.ops.attention import (packed_window_attention,
                                   scaled_dot_product_attention)


class ConvMLP(nn.Module):
    """Conv1×1 MLP (reference scalable_vit.py:89-102)."""

    dim: int
    expansion_factor: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = Conv(self.dim * self.expansion_factor, (1, 1), dtype=self.dtype,
                 name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        x = Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return x


class ScalableSelfAttention(nn.Module):
    """Reference scalable_vit.py:104-143."""

    dim: int
    heads: int = 8
    dim_key: int = 32
    dim_value: int = 32
    dropout: float = 0.0
    reduction_factor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        _, height, width, _ = x.shape
        heads = self.heads
        r = self.reduction_factor

        q = Conv(self.dim_key * heads, (1, 1), use_bias=False,
                 dtype=self.dtype, name="to_q")(x)
        k = Conv(self.dim_key * heads, (r, r), strides=r, use_bias=False,
                 dtype=self.dtype, name="to_k")(x)
        v = Conv(self.dim_value * heads, (r, r), strides=r, use_bias=False,
                 dtype=self.dtype, name="to_v")(x)

        q, k, v = map(
            lambda t: rearrange(t, "b ... (h d) -> b h (...) d", h=heads),
            (q, k, v),
        )
        # flash dispatch at large n (stage-1 q is 4096 tokens at @256 —
        # the f32 (b, h, n, n_k) maps are the batch-64 HBM blowup);
        # the XLA path is the exact parity math at small n / f32.
        out = scaled_dot_product_attention(q, k, v,
                                           scale=self.dim_key ** -0.5)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=height, y=width)
        out = Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class InteractiveWindowedSelfAttention(nn.Module):
    """Reference scalable_vit.py:145-198."""

    dim: int
    window_size: Optional[int]
    heads: int = 8
    dim_key: int = 32
    dim_value: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool = False):
        _, height, width, _ = x.shape
        heads = self.heads
        wsz_h = default(self.window_size, height)
        wsz_w = default(self.window_size, width)
        assert height % wsz_h == 0 and width % wsz_w == 0, (
            f"height ({height}) or width ({width}) of feature map is not "
            f"divisible by the window size ({wsz_h}, {wsz_w})"
        )

        q = Conv(self.dim_key * heads, (1, 1), use_bias=False,
                 dtype=self.dtype, name="to_q")(x)
        k = Conv(self.dim_key * heads, (1, 1), use_bias=False,
                 dtype=self.dtype, name="to_k")(x)
        v = Conv(self.dim_value * heads, (1, 1), use_bias=False,
                 dtype=self.dtype, name="to_v")(x)

        local_out = Conv(self.dim_value * heads, (3, 3), padding="SAME",
                         dtype=self.dtype, name="local_interactive_module")(v)

        # Channel-packed window fold: at the canonical 256² config every
        # stage is a whole-map window (x=y=1), so these rearranges are free
        # reshapes.  The head split lives inside packed_window_attention —
        # when its flash tier fires (16-bit n≥1024 / any n≥2048, measured
        # in-model: profiles/scalable_vit.md, ~3.9 ms/layer XLA vs ~1.6
        # flash) the packed kernel lane-slices heads in VMEM, removing the
        # ~2.5 ms/step of NHWC→(b,h,n,d) layout copies the head-major fold
        # cost (profiles/scalable_vit.md:66-68).
        q, k, v = map(
            lambda t: rearrange(
                t, "b (x w1) (y w2) c -> (b x y) (w1 w2) c",
                w1=wsz_h, w2=wsz_w),
            (q, k, v),
        )
        out = packed_window_attention(
            q, k, v, heads, scale=self.dim_key ** -0.5, mode=self.fused)
        out = rearrange(
            out, "(b x y) (w1 w2) c -> b (x w1) (y w2) c",
            x=height // wsz_h, y=width // wsz_w, w1=wsz_h, w2=wsz_w)
        out = out + local_out
        out = Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


def _fused_ssa_residual(x, norm, attn, mode, training):
    """``x + SSA(ChannelLN(x))`` through the fused cross-attention block
    (SSA is cross-attention: 1×1-conv queries over all tokens against
    kernel=stride=r conv-reduced k/v), or ``None`` when the gate
    declines."""
    from vit_tpu.ops.fused_cross_attention import (
        fused_cross_attention_available, fused_cross_attention_block)

    b, H, W, c = x.shape
    n = H * W
    r = attn.reduction_factor
    nk = (H // r) * (W // r)
    heads = attn.heads
    hk, hv = heads * attn.dim_key, heads * attn.dim_value
    ok = (mode == "interpret" or (
        attn.dtype in (jnp.bfloat16, jnp.float16)
        and x.dtype in (jnp.bfloat16, jnp.float16)
        and fused_cross_attention_available()))
    if (mode == "never" or not ok or n % 8 != 0 or nk > 512
            or H % r or W % r or (attn.dropout > 0.0 and training)):
        return None
    attn(jnp.zeros((1, r, r, c), x.dtype))
    ap = attn.variables["params"]

    xn = norm(x)  # once, in XLA — it feeds both the kernel and the k/v convs
    k = Conv(hk, (r, r), strides=r, use_bias=False, dtype=attn.dtype).apply(
        {"params": {"kernel": ap["to_k"]["kernel"]}}, xn)
    v = Conv(hv, (r, r), strides=r, use_bias=False, dtype=attn.dtype).apply(
        {"params": {"kernel": ap["to_v"]["kernel"]}}, xn)
    y = fused_cross_attention_block(
        x.reshape(b, n, c), xn.reshape(b, n, c),
        ap["to_q"]["kernel"].reshape(c, hk).astype(x.dtype),
        k.reshape(b, nk, hk), v.reshape(b, nk, hv),
        ap["to_out"]["kernel"].reshape(hv, c).astype(x.dtype),
        ap["to_out"]["bias"].astype(x.dtype),
        heads, attn.dim_key, attn.dim_value,
        attn.dim_key ** -0.5, mode == "interpret")
    return y.reshape(b, H, W, c)


class ScalableTransformer(nn.Module):
    """Reference scalable_vit.py:200-248, paper block order (§8.3 fix)."""

    dim: int
    depth: int
    heads: int = 8
    ff_expansion_factor: int = 4
    dropout: float = 0.0
    ssa_dim_key: int = 32
    ssa_dim_value: int = 32
    ssa_reduction_factor: int = 1
    iwsa_dim_key: int = 32
    iwsa_dim_value: int = 32
    iwsa_window_size: Optional[int] = None
    norm_output: bool = True
    dtype: Any = jnp.float32
    fused_attention: str = "auto"
    fused_mlp: str = "auto"

    def _conv_mlp(self, x, ind, tag, training):
        norm = ChannelLayerNorm(self.dim, name=f"{tag}_norm_{ind}")
        mlp = ConvMLP(self.dim, self.ff_expansion_factor,
                      dropout=self.dropout, dtype=self.dtype,
                      name=f"{tag}_{ind}")
        y = fused_conv_mlp_residual(x, norm, mlp, self.dropout, training,
                                    self.dtype, self.fused_mlp)
        return y if y is not None else x + mlp(norm(x), training=training)

    @nn.compact
    def __call__(self, x, training: bool = False):
        for ind in range(self.depth):
            norm = ChannelLayerNorm(self.dim, name=f"ssa_norm_{ind}")
            ssa = ScalableSelfAttention(
                self.dim, heads=self.heads, dim_key=self.ssa_dim_key,
                dim_value=self.ssa_dim_value,
                reduction_factor=self.ssa_reduction_factor,
                dropout=self.dropout, dtype=self.dtype,
                name=f"ssa_{ind}")
            y = (_fused_ssa_residual(x, norm, ssa, self.fused_attention,
                                     training)
                 if self.fused_attention != "never" else None)
            x = y if y is not None else x + ssa(norm(x), training=training)
            x = self._conv_mlp(x, ind, "ff1", training)
            if ind == 0:
                peg = GroupedConv(self.dim, (3, 3), padding="SAME",
                                  dtype=self.dtype,
                           name="peg")(x)
                x = peg + x
            h = ChannelLayerNorm(self.dim, name=f"iwsa_norm_{ind}")(x)
            h = InteractiveWindowedSelfAttention(
                self.dim, window_size=self.iwsa_window_size, heads=self.heads,
                dim_key=self.iwsa_dim_key, dim_value=self.iwsa_dim_value,
                dropout=self.dropout, dtype=self.dtype,
                fused=self.fused_attention,
                name=f"iwsa_{ind}")(h, training=training)
            x = x + h
            x = self._conv_mlp(x, ind, "ff2", training)
        if self.norm_output:
            x = ChannelLayerNorm(self.dim, name="norm")(x)
        return x


class ScalableViT(nn.Module):
    """Constructor parity: reference scalable_vit.py:251-265."""

    num_classes: int
    dim: int
    depth: Tuple[int, ...]
    heads: Union[int, Tuple[int, ...]]
    reduction_factor: Union[int, Tuple[int, ...]]
    window_size: Any = None
    iwsa_dim_key: Union[int, Tuple[int, ...]] = 32
    iwsa_dim_value: Union[int, Tuple[int, ...]] = 32
    ssa_dim_key: Union[int, Tuple[int, ...]] = 32
    ssa_dim_value: Union[int, Tuple[int, ...]] = 32
    ff_expansion_factor: int = 4
    channels: int = 3
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: str = "auto"
    fused_mlp: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        assert isinstance(self.depth, tuple), \
            "depth needs to be tuple if integers indicating number of transformer blocks at that stage"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        x = Conv(self.dim, (7, 7), strides=4, padding="SAME",
                 dtype=self.dtype, name="to_patches")(img)

        num_stages = len(self.depth)
        dims = tuple((2 ** i) * self.dim for i in range(num_stages))
        heads = cast_tuple(self.heads, num_stages)
        ssa_dim_key = cast_tuple(self.ssa_dim_key, num_stages)
        ssa_dim_value = cast_tuple(self.ssa_dim_value, num_stages)
        reduction = cast_tuple(self.reduction_factor, num_stages)
        iwsa_dim_key = cast_tuple(self.iwsa_dim_key, num_stages)
        iwsa_dim_value = cast_tuple(self.iwsa_dim_value, num_stages)
        window_size = cast_tuple(self.window_size, num_stages)

        for ind in range(num_stages):
            is_last = ind == num_stages - 1
            x = ScalableTransformer(
                dim=dims[ind], depth=self.depth[ind], heads=heads[ind],
                ff_expansion_factor=self.ff_expansion_factor,
                dropout=self.dropout, ssa_dim_key=ssa_dim_key[ind],
                ssa_dim_value=ssa_dim_value[ind],
                ssa_reduction_factor=reduction[ind],
                iwsa_dim_key=iwsa_dim_key[ind],
                iwsa_dim_value=iwsa_dim_value[ind],
                iwsa_window_size=window_size[ind], dtype=self.dtype,
                fused_attention=self.fused_attention,
                fused_mlp=self.fused_mlp,
                name=f"stage_{ind}",
            )(x, training=training)
            if not is_last:
                x = Conv(dims[ind] * 2, (3, 3), strides=2, padding="SAME",
                         dtype=self.dtype, name=f"downsample_{ind}")(x)

        x = jnp.mean(x, axis=(1, 2))
        x = LayerNorm(dtype=self.dtype, name="head_norm")(x)
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)
