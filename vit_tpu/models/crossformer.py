"""CrossFormer — cross-scale embedding + alternating short/long-distance
attention with MLP-computed dynamic position bias
(parity target: reference crossformer.py:205-257).

Cross-scale embedding concatenates parallel convs with different kernels,
splitting the dim geometrically (crossformer.py:30-48).  Blocks alternate
short (windowed) and long (dilated-window) attention via pure layout
rearranges into the batch dim (crossformer.py:143-146).  The dynamic
position bias MLP is evaluated per call on the (2w+1)² continuous relative
coordinates and gathered on-device — the reference's ``.numpy()`` gather
(crossformer.py:163) breaks graph mode and gradients (SURVEY.md §8.5); here
it is a jit-safe ``jnp`` gather and gradients flow into the DPB MLP.
"""

from __future__ import annotations

import os
from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.helpers import cast_tuple
from vit_tpu.layers.common import (ChannelLayerNorm, Conv, Dense, LayerNorm,
                                   fused_conv_mlp_residual, gelu_exact,
                                   windowed_attention_eligible)


def _fused_crossformer_attention_residual(x, attn, mode, training):
    """``x + CrossFormerAttention(x)`` through the bias-capable fused
    attention block with windows folded into the batch axis, or ``None``
    when the gate declines.

    The dynamic position bias stays an XLA-computed (1, n, n) table (the
    DPB MLP over (2w+1)² coords is tiny) fed to the kernel's bias operand;
    its gradient flows back through the gather into the DPB params."""
    from vit_tpu.ops.fused_attention_block import fused_attention_block_bias

    wsz = attn.window_size
    b, H, W, c = x.shape
    heads = c // attn.dim_head
    n = wsz * wsz
    groups = b * (H // wsz) * (W // wsz)
    # n >= 8: stage-4 long attention degenerates to 1-token windows where
    # the kernel has nothing to fuse.
    if n < 8 or not windowed_attention_eligible(
            (groups, n, c), x.dtype, attn.dropout, training, attn.dtype,
            mode):
        return None
    inner = heads * attn.dim_head
    dummy = jnp.zeros((1, wsz, wsz, c), x.dtype)
    attn(dummy)
    ap = attn.variables["params"]
    wqkv = ap["to_qkv"]["kernel"].reshape(c, 3 * inner).astype(x.dtype)
    wo = ap["to_out"]["kernel"].reshape(inner, c).astype(x.dtype)
    bo = ap["to_out"]["bias"].astype(x.dtype)
    g = ap["norm"]["g"].reshape(-1).astype(jnp.float32)
    bn = ap["norm"]["b"].reshape(-1).astype(jnp.float32)

    pos = np.arange(-wsz, wsz + 1)
    rel_coords = np.stack(np.meshgrid(pos, pos, indexing="ij"),
                          axis=0).reshape(2, -1).T
    grid = np.stack(np.meshgrid(np.arange(wsz), np.arange(wsz),
                                indexing="ij"), axis=0).reshape(2, -1).T
    rel_pos = grid[:, None] - grid[None, :] + wsz - 1
    rel_idx = (rel_pos * np.array([2 * wsz - 1, 1])).sum(-1)
    biases = DynamicPositionBias(c // 4, dtype=attn.dtype).apply(
        {"params": ap["dpb"]}, jnp.asarray(rel_coords, jnp.float32))
    bias = biases[jnp.asarray(rel_idx)][None].astype(jnp.float32)

    if attn.attn_type == "short":
        xw = rearrange(x, "b (h s1) (w s2) d -> (b h w) (s1 s2) d",
                       s1=wsz, s2=wsz)
    else:
        xw = rearrange(x, "b (l1 h) (l2 w) d -> (b h w) (l1 l2) d",
                       l1=wsz, l2=wsz)
    yw = fused_attention_block_bias(xw, g, bn, wqkv, wo, bo, bias, heads,
                                    attn.dim_head, None, 1e-5,
                                    mode == "interpret")
    if attn.attn_type == "short":
        return rearrange(yw, "(b h w) (s1 s2) d -> b (h s1) (w s2) d",
                         h=H // wsz, w=W // wsz, s1=wsz, s2=wsz)
    return rearrange(yw, "(b h w) (l1 l2) d -> b (l1 h) (l2 w) d",
                     h=H // wsz, w=W // wsz, l1=wsz, l2=wsz)


class CrossEmbedLayer(nn.Module):
    """Reference crossformer.py:30-48."""

    dim: int
    kernel_sizes: Tuple[int, ...]
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        kernel_sizes = sorted(self.kernel_sizes)
        num_scales = len(kernel_sizes)
        dim_scales = [int(self.dim / (2 ** i)) for i in range(1, num_scales)]
        dim_scales = [*dim_scales, self.dim - sum(dim_scales)]

        convs = [Conv(dim_scale, (kernel, kernel), strides=self.stride,
                      padding="SAME", dtype=self.dtype, name=f"conv_{i}")
                 for i, (kernel, dim_scale)
                 in enumerate(zip(kernel_sizes, dim_scales))]

        s = self.stride
        H, W = x.shape[1:3]
        if H % s == 0 and W % s == 0 and num_scales > 1:
            # Fused stem: the parallel convs re-read the full input map once
            # per scale (2.2 ms/step on the 224² stage-1 image,
            # profiles/crossformer.md). Because every scale shares the
            # stride and 'SAME' centering, embedding each k×k kernel at
            # spatial offset pad_lo(K) - pad_lo(k) inside a zeroed K×K
            # kernel (K = largest scale) makes ONE conv compute all scales
            # in a single pass over the input — identical taps, identical
            # param tree, zero taps contribute exactly 0 to the f32
            # accumulator. (pad_lo(k) = max(k - s, 0)//2 since H % s == 0;
            # kernels smaller than the stride get no padding at all.)
            cin = x.shape[-1]
            # Kernel shapes depend only on cin, so a 1×1 dummy binds the
            # child params; the dead convs are DCE'd by XLA.
            dummy = jnp.zeros((1, 1, 1, cin), x.dtype)
            for conv in convs:
                conv(dummy)  # bind params without touching the real map
            big = kernel_sizes[-1]
            lo = lambda k: max(k - s, 0) // 2
            lo_big = lo(big)
            kparts, bparts = [], []
            for k, conv in zip(kernel_sizes, convs):
                p = conv.variables["params"]
                off = lo_big - lo(k)
                kparts.append(jnp.pad(
                    p["kernel"], ((off, big - k - off), (off, big - k - off),
                                  (0, 0), (0, 0))))
                bparts.append(p["bias"])
            kernel = jnp.concatenate(kparts, axis=-1)
            bias = jnp.concatenate(bparts)
            xs, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
            lo_hi = max(big - s, 0) - lo_big
            if big % s == 0 and os.environ.get(
                    "VIT_TPU_S2D_STEM", "1") == "1":
                # Space-to-depth rewrite: XLA's conv emitter pays dearly for
                # the strided big-K conv (2.50 ms at ~31 TF/s on the 224²
                # stage-1 map, profiles/crossformer.md — N=64 lane underfill
                # × stride-4 overlapping-window im2col; GEMM bound ~0.43 ms).
                # Because big % s == 0: pad once with the conv's own
                # (pad_lo, pad_hi), pack each s×s pixel block into channels
                # (ry, rx, c), and reindex the kernel the same way
                # (big, big, cin, cout) → (big/s, big/s, s·s·cin, cout).
                # The stride-1 conv then computes the IDENTICAL sums — same
                # taps, same f32 accumulation targets — but with s²× deeper
                # input channels feeding the MXU and no window overlap.
                xp = jnp.pad(
                    xs, ((0, 0), (lo_big, lo_hi), (lo_big, lo_hi), (0, 0)))
                b, hp, wp, _ = xp.shape
                xp = xp.reshape(b, hp // s, s, wp // s, s, cin)
                xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, hp // s, wp // s, s * s * cin)
                kb = big // s
                k2 = kernel.reshape(kb, s, kb, s, cin, self.dim)
                k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(
                    kb, kb, s * s * cin, self.dim)
                out = jax.lax.conv_general_dilated(
                    xp, k2, (1, 1), [(0, 0)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return out + bias
            out = jax.lax.conv_general_dilated(
                xs, kernel, (s, s),
                [(lo_big, lo_hi)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + bias

        return jnp.concatenate([conv(x) for conv in convs], axis=-1)


class DynamicPositionBias(nn.Module):
    """3×[Dense-LN-ReLU] → Dense(1) over continuous relative coords
    (reference crossformer.py:51-71)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i in range(3):
            x = Dense(self.dim, dtype=self.dtype, name=f"fc{i}")(x)
            x = LayerNorm(dtype=self.dtype, name=f"norm{i}")(x)
            x = nn.relu(x)
        x = Dense(1, dtype=self.dtype, name="out")(x)
        return jnp.squeeze(x, axis=-1)


class CrossFormerAttention(nn.Module):
    """Short (windowed) or long (dilated) attention (crossformer.py:104-180)."""

    dim: int
    attn_type: str
    window_size: int
    dim_head: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.attn_type in {"short", "long"}, \
            "attention type must be one of local or distant"
        heads = self.dim // self.dim_head
        inner_dim = self.dim_head * heads
        wsz = self.window_size
        _, height, width, _ = x.shape

        x = ChannelLayerNorm(self.dim, name="norm")(x)

        if self.attn_type == "short":
            x = rearrange(x, "b (h s1) (w s2) d -> (b h w) s1 s2 d",
                          s1=wsz, s2=wsz)
        else:
            x = rearrange(x, "b (l1 h) (l2 w) d -> (b h w) l1 l2 d",
                          l1=wsz, l2=wsz)

        qkv = Conv(inner_dim * 3, (1, 1), use_bias=False, dtype=self.dtype,
                   name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b x y (h d) -> b h (x y) d", h=heads),
            (q, k, v),
        )
        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32)

        # dynamic position bias, gathered on-device (§8.5 fix)
        pos = np.arange(-wsz, wsz + 1)
        rel_coords = np.stack(np.meshgrid(pos, pos, indexing="ij"),
                              axis=0).reshape(2, -1).T  # ((2w+1)², 2)
        grid = np.stack(np.meshgrid(np.arange(wsz), np.arange(wsz),
                                    indexing="ij"), axis=0).reshape(2, -1).T
        rel_pos = grid[:, None] - grid[None, :] + wsz - 1
        rel_pos_indices = (rel_pos * np.array([2 * wsz - 1, 1])).sum(-1)

        biases = DynamicPositionBias(self.dim // 4, dtype=self.dtype,
                                     name="dpb")(
            jnp.asarray(rel_coords, jnp.float32))
        rel_pos_bias = biases[jnp.asarray(rel_pos_indices)]
        sim = sim + rel_pos_bias.astype(sim.dtype)

        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=wsz, y=wsz)
        out = Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)

        if self.attn_type == "short":
            out = rearrange(out, "(b h w) s1 s2 d -> b (h s1) (w s2) d",
                            h=height // wsz, w=width // wsz)
        else:
            out = rearrange(out, "(b h w) l1 l2 d -> b (l1 h) (l2 w) d",
                            h=height // wsz, w=width // wsz)
        return out


class CrossFormerMLP(nn.Module):
    """LN-inside MLP (reference crossformer.py:89-102)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = ChannelLayerNorm(self.dim, name="norm")(x)
        x = Conv(self.dim * self.mult, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        x = Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(x)
        return x


class CrossFormer(nn.Module):
    """Constructor parity: reference crossformer.py:206-216."""

    dim: Union[int, Tuple[int, ...]] = (64, 128, 256, 512)
    depth: Union[int, Tuple[int, ...]] = (2, 2, 8, 2)
    global_window_size: Union[int, Tuple[int, ...]] = (8, 4, 2, 1)
    local_window_size: Union[int, Tuple[int, ...]] = 7
    cross_embed_kernel_sizes: Tuple = ((4, 8, 16, 32), (2, 4), (2, 4), (2, 4))
    cross_embed_strides: Union[int, Tuple[int, ...]] = (4, 2, 2, 2)
    num_classes: int = 1000
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: str = "auto"
    fused_mlp: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        for name in ("dim", "depth", "global_window_size", "local_window_size",
                     "cross_embed_kernel_sizes", "cross_embed_strides"):
            assert len(cast_tuple(getattr(self, name), 4)) == 4

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        dims = cast_tuple(self.dim, 4)
        depths = cast_tuple(self.depth, 4)
        g_wsz = cast_tuple(self.global_window_size, 4)
        l_wsz = cast_tuple(self.local_window_size, 4)
        cel_kernels = cast_tuple(self.cross_embed_kernel_sizes, 4)
        cel_strides = cast_tuple(self.cross_embed_strides, 4)

        for s, (dim_out, layers, gw, lw, ks, st) in enumerate(
                zip(dims, depths, g_wsz, l_wsz, cel_kernels, cel_strides)):
            x = CrossEmbedLayer(dim_out, ks, stride=st, dtype=self.dtype,
                                name=f"cel_{s}")(x, training=training)
            for i in range(layers):
                for kind, w in (("short", lw), ("long", gw)):
                    attn = CrossFormerAttention(
                        dim_out, attn_type=kind, window_size=w,
                        dropout=self.attn_dropout, dtype=self.dtype,
                        name=f"{kind}_attn_{s}_{i}")
                    y = (_fused_crossformer_attention_residual(
                            x, attn, self.fused_attention, training)
                         if self.fused_attention != "never" else None)
                    x = y if y is not None else x + attn(x,
                                                         training=training)
                    mlp = CrossFormerMLP(dim_out, dropout=self.ff_dropout,
                                         dtype=self.dtype,
                                         name=f"{kind}_ff_{s}_{i}")
                    y = fused_conv_mlp_residual(
                        x, None, mlp, self.ff_dropout, training, self.dtype,
                        self.fused_mlp)
                    x = y if y is not None else x + mlp(x, training=training)

        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)
