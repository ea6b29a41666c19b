"""Twins-SVT — alternating windowed-local / reduced-global attention
(parity target: reference twins_svt.py:215-268).

4 stages of [patch-merge embed → 1 block → PEG → depth blocks]
(twins_svt.py:246-259); each block runs windowed local attention
(twins_svt.py:117-156, windows folded into the batch dim — no kernel change
needed, SURVEY.md §5), then global attention whose k/v come from a k×k/sk
conv reduction (twins_svt.py:158-190).  Stage 4 drops the local pair.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.layers.common import (ChannelLayerNorm, Conv, Dense, GroupedConv,
                                   fused_conv_mlp_residual, gelu_exact,
                                   windowed_attention_eligible)


def _fused_global_attention_residual(x, norm, attn, mode, training):
    """``x + GlobalAttention(ChannelLN(x))`` through the fused
    cross-attention block, or ``None`` when the gate declines.

    The LN runs once in XLA (it also feeds the strided k/v conv); the
    kernel fuses the q projection, per-head attention against the
    conv-reduced k/v, the out projection and the residual — replacing the
    head split/merge reshapes and layout copies XLA needs for the same
    composition (~9 ms/step at Twins stage 1, profiles/twins_svt.md)."""
    from vit_tpu.ops.fused_cross_attention import (
        fused_cross_attention_available, fused_cross_attention_block)

    b, H, W, c = x.shape
    n = H * W
    gk = attn.k
    nk = (H // gk) * (W // gk)
    inner = attn.heads * attn.dim_head
    ok = (mode == "interpret" or (
        attn.dtype in (jnp.bfloat16, jnp.float16)
        and x.dtype in (jnp.bfloat16, jnp.float16)
        and fused_cross_attention_available()))
    if (mode == "never" or not ok or n % 8 != 0 or nk > 512
            or H % gk or W % gk
            or (attn.dropout > 0.0 and training)):
        return None
    attn(jnp.zeros((1, gk, gk, c), x.dtype))
    ap = attn.variables["params"]

    xn = norm(x)  # once, in XLA — it feeds both the kernel and the kv conv
    kv = Conv(inner * 2, (gk, gk), strides=gk, use_bias=False,
              dtype=attn.dtype).apply(
        {"params": {"kernel": ap["to_kv"]["kernel"]}}, xn)
    k, v = jnp.split(kv.reshape(b, nk, 2 * inner), 2, axis=-1)
    y = fused_cross_attention_block(
        x.reshape(b, n, c), xn.reshape(b, n, c),
        ap["to_q"]["kernel"].reshape(c, inner).astype(x.dtype),
        k, v,
        ap["to_out"]["kernel"].reshape(inner, c).astype(x.dtype),
        ap["to_out"]["bias"].astype(x.dtype),
        attn.heads, attn.dim_head, attn.dim_head, None,
        mode == "interpret")
    return y.reshape(b, H, W, c)


def _fused_local_attention_residual(x, norm, attn, mode, training):
    """``x + LocalAttention(ChannelLN(x))`` through the fused attention
    block kernel with windows folded into the batch axis, or ``None`` when
    the gate declines (caller runs the exact XLA path).

    The window fold is a pure token permutation, so it commutes with the
    per-token LN / 1×1-conv projections — the kernel sees (b·wins, p², c)
    and keeps every (p², p²) score tile in VMEM instead of XLA's
    HBM-materialized f32 (b·wins·heads, p², p²) maps."""
    from vit_tpu.ops.fused_attention_block import fused_attention_block

    p = attn.patch_size
    b, H, W, c = x.shape
    groups = b * (H // p) * (W // p)
    if not windowed_attention_eligible((groups, p * p, c), x.dtype,
                                       attn.dropout, training, attn.dtype,
                                       mode):
        return None
    inner = attn.heads * attn.dim_head
    dummy = jnp.zeros((1, p, p, c), x.dtype)
    norm(dummy)
    attn(dummy)
    np_ = norm.variables["params"]
    ap = attn.variables["params"]
    wq = ap["to_q"]["kernel"].reshape(c, inner)
    wkv = ap["to_kv"]["kernel"].reshape(c, 2 * inner)
    wqkv = jnp.concatenate([wq, wkv], axis=-1).astype(x.dtype)
    wo = ap["to_out"]["kernel"].reshape(inner, c).astype(x.dtype)
    bo = ap["to_out"]["bias"].astype(x.dtype)
    xw = rearrange(x, "b (x p1) (y p2) c -> (b x y) (p1 p2) c", p1=p, p2=p)
    yw = fused_attention_block(
        xw,
        np_["g"].reshape(-1).astype(jnp.float32),
        np_["b"].reshape(-1).astype(jnp.float32),
        wqkv, wo, bo, attn.heads, attn.dim_head, None, norm.eps,
        mode == "interpret")
    return rearrange(yw, "(b x y) (p1 p2) c -> b (x p1) (y p2) c",
                     x=H // p, y=W // p, p1=p, p2=p)


class ConvMLP(nn.Module):
    """Conv1×1 MLP over NHWC (reference twins_svt.py:78-92)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = Conv(self.dim * self.mult, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        x = Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return x


class PatchEmbedding(nn.Module):
    """Space-to-depth (c p1 p2 channel order!) + 1×1 conv projection
    (reference twins_svt.py:94-106)."""

    dim_out: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap, training: bool = False):
        p = self.patch_size
        fmap = rearrange(fmap, "b (h p1) (w p2) c -> b h w (c p1 p2)",
                         p1=p, p2=p)
        return Conv(self.dim_out, (1, 1), dtype=self.dtype, name="proj")(fmap)


class PEG(nn.Module):
    """Residual depthwise conv positional generator (twins_svt.py:108-115)."""

    dim: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = GroupedConv(self.dim, (self.kernel_size, self.kernel_size),
                   padding="SAME",
                   dtype=self.dtype, name="proj")(x)
        return out + x


class LocalAttention(nn.Module):
    """Windowed attention; windows fold into batch (twins_svt.py:117-156)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    patch_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap, training: bool = False):
        inner_dim = self.dim_head * self.heads
        h, p = self.heads, self.patch_size
        _, H, W, _ = fmap.shape
        nx, ny = H // p, W // p

        fmap = rearrange(fmap, "b (x p1) (y p2) c -> (b x y) p1 p2 c",
                         p1=p, p2=p)
        q = Conv(inner_dim, (1, 1), use_bias=False, dtype=self.dtype,
                 name="to_q")(fmap)
        kv = Conv(inner_dim * 2, (1, 1), use_bias=False, dtype=self.dtype,
                  name="to_kv")(fmap)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b p1 p2 (h d) -> (b h) (p1 p2) d", h=h),
            (q, k, v),
        )
        dots = jnp.einsum("bid,bjd->bij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bij,bjd->bid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = rearrange(out, "(b x y h) (p1 p2) d -> b (x p1) (y p2) (h d)",
                        h=h, x=nx, y=ny, p1=p, p2=p)
        out = Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class GlobalAttention(nn.Module):
    """Global attention with conv-reduced k/v (twins_svt.py:158-190)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    k: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inner_dim = self.dim_head * self.heads
        h = self.heads
        y = x.shape[2]

        q = Conv(inner_dim, (1, 1), use_bias=False, dtype=self.dtype,
                 name="to_q")(x)
        kv = Conv(inner_dim * 2, (self.k, self.k), strides=self.k,
                  use_bias=False, dtype=self.dtype, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b x y (h d) -> (b h) (x y) d", h=h),
            (q, k, v),
        )
        dots = jnp.einsum("bid,bjd->bij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bij,bjd->bid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = rearrange(out, "(b h) (x y) d -> b x y (h d)", h=h, y=y)
        out = Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class TwinsTransformer(nn.Module):
    """Reference twins_svt.py:192-213."""

    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64
    mlp_mult: int = 4
    local_patch_size: int = 7
    global_k: int = 7
    dropout: float = 0.0
    has_local: bool = True
    dtype: Any = jnp.float32
    fused_attention: str = "auto"
    fused_mlp: str = "auto"

    def _conv_mlp(self, x, i, tag, training):
        norm = ChannelLayerNorm(self.dim, name=f"{tag}_norm_{i}")
        mlp = ConvMLP(self.dim, self.mlp_mult, dropout=self.dropout,
                      dtype=self.dtype, name=f"{tag}_{i}")
        y = fused_conv_mlp_residual(x, norm, mlp, self.dropout, training,
                                    self.dtype, self.fused_mlp)
        return y if y is not None else x + mlp(norm(x), training=training)

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i in range(self.depth):
            if self.has_local:
                norm = ChannelLayerNorm(self.dim, dtype=self.dtype,
                                        name=f"local_norm_{i}")
                attn = LocalAttention(self.dim, heads=self.heads,
                                      dim_head=self.dim_head,
                                      dropout=self.dropout,
                                      patch_size=self.local_patch_size,
                                      dtype=self.dtype,
                                      name=f"local_attn_{i}")
                y = (_fused_local_attention_residual(
                        x, norm, attn, self.fused_attention, training)
                     if self.fused_attention != "never" else None)
                x = y if y is not None else x + attn(norm(x),
                                                     training=training)
                x = self._conv_mlp(x, i, "ff1", training)
            norm = ChannelLayerNorm(self.dim, name=f"global_norm_{i}")
            gattn = GlobalAttention(self.dim, heads=self.heads,
                                    dim_head=self.dim_head,
                                    dropout=self.dropout,
                                    k=self.global_k, dtype=self.dtype,
                                    name=f"global_attn_{i}")
            y = (_fused_global_attention_residual(
                    x, norm, gattn, self.fused_attention, training)
                 if self.fused_attention != "never" else None)
            x = y if y is not None else x + gattn(norm(x),
                                                  training=training)
            x = self._conv_mlp(x, i, "ff2", training)
        return x


class TwinsSVT(nn.Module):
    """Constructor parity: reference twins_svt.py:216-240."""

    num_classes: int
    s1_emb_dim: int = 64
    s1_patch_size: int = 4
    s1_local_patch_size: int = 7
    s1_global_k: int = 7
    s1_depth: int = 1
    s2_emb_dim: int = 128
    s2_patch_size: int = 2
    s2_local_patch_size: int = 7
    s2_global_k: int = 7
    s2_depth: int = 1
    s3_emb_dim: int = 256
    s3_patch_size: int = 2
    s3_local_patch_size: int = 7
    s3_global_k: int = 7
    s3_depth: int = 5
    s4_emb_dim: int = 512
    s4_patch_size: int = 2
    s4_local_patch_size: int = 7
    s4_global_k: int = 7
    s4_depth: int = 4
    peg_kernel_size: int = 3
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: str = "auto"
    fused_mlp: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        for prefix in ("s1", "s2", "s3", "s4"):
            cfg = {name: getattr(self, f"{prefix}_{name}") for name in
                   ("emb_dim", "patch_size", "local_patch_size", "global_k",
                    "depth")}
            is_last = prefix == "s4"
            dim = cfg["emb_dim"]
            x = PatchEmbedding(dim_out=dim, patch_size=cfg["patch_size"],
                               dtype=self.dtype, name=f"{prefix}_embed")(
                x, training=training)
            x = TwinsTransformer(
                dim=dim, depth=1, local_patch_size=cfg["local_patch_size"],
                global_k=cfg["global_k"], dropout=self.dropout,
                has_local=not is_last, dtype=self.dtype,
                fused_attention=self.fused_attention,
                fused_mlp=self.fused_mlp,
                name=f"{prefix}_pre_transformer",
            )(x, training=training)
            x = PEG(dim=dim, kernel_size=self.peg_kernel_size,
                    dtype=self.dtype, name=f"{prefix}_peg")(
                x, training=training)
            x = TwinsTransformer(
                dim=dim, depth=cfg["depth"],
                local_patch_size=cfg["local_patch_size"],
                global_k=cfg["global_k"], dropout=self.dropout,
                has_local=not is_last, dtype=self.dtype,
                fused_attention=self.fused_attention,
                fused_mlp=self.fused_mlp,
                name=f"{prefix}_transformer",
            )(x, training=training)

        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, dtype=self.dtype, name="head")(x)
