"""RegionViT — regional-to-local attention
(parity target: reference regionvit.py:184-263).

Parallel local (stride-4) and regional (window·4-patch) tokenizations
(regionvit.py:210-226).  Per layer the SAME attention module (shared
weights — regionvit.py:158-169) first self-attends the region tokens, then
each region token is prepended to its window's local tokens for joint
attention with a relative position bias zero-padded for the region slot
(regionvit.py:143-155).  A shared Downsample conv halves both streams per
stage; classification head mean-pools the region tokens.
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.helpers import cast_tuple, divisible_by
from vit_tpu.layers.common import (Conv, Dense, GroupedConv, LayerNorm, gelu_exact,
                                   windowed_attention_eligible)


def _fused_region_attention_residual(x, attn, mode, training,
                                     rel_pos_bias=None):
    """``attn(x, rel_pos_bias) + x`` through the fused attention block
    (bias-capable variant when the per-head relative position table is
    given), or ``None`` when the gate declines.  ``attn`` is the shared
    ``RegionAttention`` module — the same params serve the region
    self-attention and the joint region+local window attention
    (reference regionvit.py:158-169)."""
    from vit_tpu.ops.fused_attention_block import (fused_attention_block,
                                                   fused_attention_block_bias)

    G, n, c = x.shape
    # Keep the fused path to the big-group stages (G >= 128): RegionViT's
    # whole-train-step module otherwise embeds 10 Mosaic kernels across its
    # 4 stages and the remote tpu_compile_helper is OOM-killed compiling it
    # (each kernel compiles fine alone — the d=512 stage-4 one alone costs
    # 469 s; the aggregate module is what dies).  The dropped stages are
    # the small-batch ones (64 groups) where the kernel win is marginal.
    if G < 128:
        return None
    if not windowed_attention_eligible((G, n, c), x.dtype, attn.dropout,
                                       training, attn.dtype, mode):
        return None
    inner = attn.heads * attn.dim_head
    attn(jnp.zeros((1, 1, c), x.dtype))
    ap = attn.variables["params"]
    args = (
        x,
        ap["norm"]["scale"].astype(jnp.float32),
        ap["norm"]["bias"].astype(jnp.float32),
        ap["to_qkv"]["kernel"].astype(x.dtype),
        ap["to_out"]["kernel"].astype(x.dtype),
        ap["to_out"]["bias"].astype(x.dtype),
    )
    if rel_pos_bias is None:
        return fused_attention_block(*args, attn.heads, attn.dim_head,
                                     None, 1e-3, mode == "interpret")
    bias = rel_pos_bias[0].astype(jnp.float32)  # (1,h,i,j) -> (heads, n, n)
    return fused_attention_block_bias(*args, bias, attn.heads,
                                      attn.dim_head, None, 1e-3,
                                      mode == "interpret")


class RegionAttention(nn.Module):
    """Prenorm attention with optional additive bias (regionvit.py:79-116)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, training: bool = False):
        h = self.heads
        inner_dim = self.dim_head * h
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        qkv = Dense(inner_dim * 3, use_bias=False, dtype=self.dtype,
                    name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=h), (q, k, v))
        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        if rel_pos_bias is not None:
            sim = sim + rel_pos_bias.astype(sim.dtype)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = rearrange(out, "b h n d -> b n (h d)")
        return Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class RegionMLP(nn.Module):
    """LN-inside MLP (regionvit.py:64-77)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = Dense(self.dim * self.mult, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        x = Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class R2LTransformer(nn.Module):
    """Reference regionvit.py:118-182."""

    dim: int
    window_size: int
    depth: int = 4
    heads: int = 4
    dim_head: int = 32
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: str = "auto"

    @nn.compact
    def __call__(self, local_tokens, region_tokens, training: bool = False):
        lh, lw = local_tokens.shape[1:3]
        rh, rw = region_tokens.shape[1:3]
        wh, ww = lh // rh, lw // rw
        wsz = self.window_size

        local_tokens = rearrange(local_tokens, "b h w c -> b (h w) c")
        region_tokens = rearrange(region_tokens, "b h w c -> b (h w) c")

        # local relative position bias, zero-padded for the region slot
        # (regionvit.py:143-155)
        gx, gy = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
        grid = np.stack([gx, gy]).reshape(2, -1)
        rel = (grid[:, :, None] - grid[:, None, :]) + (wsz - 1)
        bias_indices = (rel * np.array([1, wsz * 2 - 1])[:, None, None]).sum(0)

        rel_positions = (2 * wsz - 1) ** 2
        bias_table = nn.Embed(rel_positions, self.heads,
                              name="local_rel_pos_bias")(
            jnp.asarray(bias_indices))
        rel_pos_bias = rearrange(bias_table, "i j h -> () h i j")
        rel_pos_bias = jnp.pad(rel_pos_bias,
                               ((0, 0), (0, 0), (1, 0), (1, 0)))

        for i in range(self.depth):
            # one attention module shared between the region self-attention
            # and the joint region+local attention (regionvit.py:158-169)
            attn = RegionAttention(self.dim, heads=self.heads,
                                   dim_head=self.dim_head,
                                   dropout=self.attn_dropout,
                                   dtype=self.dtype, name=f"attn_{i}")
            ff = RegionMLP(self.dim, dropout=self.ff_dropout,
                           dtype=self.dtype, name=f"ff_{i}")

            y = (_fused_region_attention_residual(
                    region_tokens, attn, self.fused_attention, training)
                 if self.fused_attention != "never" else None)
            region_tokens = y if y is not None else \
                attn(region_tokens, training=training) + region_tokens

            lt = rearrange(local_tokens, "b (h w) d -> b h w d", h=lh)
            lt = rearrange(lt, "b (h p1) (w p2) d -> (b h w) (p1 p2) d",
                           p1=wh, p2=ww)
            rt = rearrange(region_tokens, "b n d -> (b n) () d")

            joint = jnp.concatenate([rt, lt], axis=1)
            y = (_fused_region_attention_residual(
                    joint, attn, self.fused_attention, training,
                    rel_pos_bias=rel_pos_bias)
                 if self.fused_attention != "never" else None)
            joint = y if y is not None else \
                attn(joint, rel_pos_bias=rel_pos_bias,
                     training=training) + joint
            joint = ff(joint, training=training) + joint

            region_tokens, local_tokens = joint[:, :1], joint[:, 1:]
            local_tokens = rearrange(
                local_tokens, "(b h w) (p1 p2) d -> b (h p1 w p2) d",
                h=lh // wh, w=lw // ww, p1=wh)
            region_tokens = rearrange(region_tokens, "(b n) () d -> b n d",
                                      n=rh * rw)

        local_tokens = rearrange(local_tokens, "b (h w) c -> b h w c", h=lh)
        region_tokens = rearrange(region_tokens, "b (h w) c -> b h w c", h=rh)
        return local_tokens, region_tokens


class RegionViT(nn.Module):
    """Constructor parity: reference regionvit.py:185-195."""

    dim: Union[int, Tuple[int, ...]] = (64, 128, 256, 512)
    depth: Union[int, Tuple[int, ...]] = (2, 2, 8, 2)
    window_size: int = 7
    num_classes: int = 1000
    tokenize_local_3_conv: bool = False
    local_patch_size: int = 4
    use_peg: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        assert len(cast_tuple(self.dim, 4)) == 4, \
            "dim needs to be a single value or a tuple of length 4"
        assert len(cast_tuple(self.depth, 4)) == 4, \
            "depth needs to be a single value or a tuple of length 4"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        dims = cast_tuple(self.dim, 4)
        depths = cast_tuple(self.depth, 4)
        region_patch_size = self.local_patch_size * self.window_size
        _, h, w, _ = x.shape
        assert divisible_by(h, region_patch_size) and \
            divisible_by(w, region_patch_size), \
            "height and width must be divisible by region patch size"
        assert divisible_by(h, self.local_patch_size) and \
            divisible_by(w, self.local_patch_size), \
            "height and width must be divisible by local patch size"

        init_dim = dims[0]
        if self.tokenize_local_3_conv:
            lt = Conv(init_dim, (3, 3), strides=2, padding="SAME",
                      dtype=self.dtype, name="local_conv0")(x)
            lt = LayerNorm(dtype=self.dtype, name="local_norm0")(lt)
            lt = gelu_exact(lt)
            lt = Conv(init_dim, (3, 3), strides=2, padding="SAME",
                      dtype=self.dtype, name="local_conv1")(lt)
            lt = LayerNorm(dtype=self.dtype, name="local_norm1")(lt)
            lt = gelu_exact(lt)
            local_tokens = Conv(init_dim, (3, 3), padding="SAME",
                                dtype=self.dtype, name="local_conv2")(lt)
        else:
            local_tokens = Conv(init_dim, (8, 8), strides=4, padding="SAME",
                                dtype=self.dtype, name="local_encoder")(x)

        rt = rearrange(x, "b (h p1) (w p2) c -> b h w (c p1 p2)",
                       p1=region_patch_size, p2=region_patch_size)
        region_tokens = Conv(init_dim, (1, 1), dtype=self.dtype,
                             name="region_encoder")(rt)

        for ind, (d, num_layers) in enumerate(zip(dims, depths)):
            if ind != 0:
                down = Conv(d, (3, 3), strides=2, padding="SAME",
                            dtype=self.dtype, name=f"downsample_{ind}")
                local_tokens = down(local_tokens)
                region_tokens = down(region_tokens)
            if ind != 0 and self.use_peg:
                peg_out = GroupedConv(d, (3, 3), padding="SAME",
                                      dtype=self.dtype,
                               name=f"peg_{ind}")(local_tokens)
                local_tokens = peg_out + local_tokens
            local_tokens, region_tokens = R2LTransformer(
                d, window_size=self.window_size, depth=num_layers,
                attn_dropout=self.attn_dropout, ff_dropout=self.ff_dropout,
                dtype=self.dtype, fused_attention=self.fused_attention,
                name=f"transformer_{ind}",
            )(local_tokens, region_tokens, training=training)

        out = jnp.mean(region_tokens, axis=(1, 2))
        out = LayerNorm(dtype=self.dtype, name="head_norm")(out)
        return Dense(self.num_classes, dtype=self.dtype, name="head")(out)
