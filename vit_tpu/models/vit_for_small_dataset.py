"""ViT for small datasets — Shifted Patch Tokenization + Locality
Self-Attention (parity target: reference vit_for_small_dataset.py:159-215).

SPT concatenates four zero-padded diagonal shifts channel-wise before
patchify+LN+Dense (reference :142-157, shift :15-47); LSA uses a learnable
log-temperature and masks the attention diagonal to -f32.max (reference
:88-121).  Both ``SPT`` and ``LSA`` are public standalone modules (reference
README.md:860-875).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn

from vit_tpu.core.helpers import pair
from vit_tpu.layers.common import (Dense, LayerNorm, MLP,
                                   _fused_attention_tier, fused_mlp_residual)
from vit_tpu.ops.attention import apply_attention, mask_value
from vit_tpu.ops.patchify import patchify


def apply_fused_lsa_block(norm: nn.Module, attn: "LSA", x: jax.Array,
                          heads: int, dim_head: int,
                          interpret: bool = False) -> jax.Array:
    """Run ``x + LSA(norm(x))`` through the fused attention-block kernel.

    LSA differs from plain attention in two ways and both fold into the
    kernel's existing operands, so no LSA-specific kernel is needed:

    - the learnable temperature (reference vit_for_small_dataset.py:95)
      scales the logits — multiplying the q-third of ``to_qkv``'s kernel by
      ``exp(temperature)`` (with the kernel's static scale set to 1.0)
      computes the identical logits, and because the fold happens *outside*
      the custom-VJP boundary the chain rule delivers the temperature
      gradient through the kernel's dwqkv;
    - the diagonal self-mask (reference :109-112) is an additive constant:
      a ``(1, n, n)`` bias with ``-f32.max`` on the diagonal, the same
      operand CrossFormer's DPB uses.

    Same dummy-declaration pattern as ``apply_fused_attention_block`` —
    the param tree (and TF transplant) is unchanged.
    """
    from vit_tpu.ops.fused_attention_block import fused_attention_block_bias

    dummy = jnp.zeros((1, 1, x.shape[-1]), x.dtype)
    norm(dummy)
    attn(dummy)
    np_ = norm.variables["params"]
    ap = attn.variables["params"]
    inner = heads * dim_head

    wqkv = ap["to_qkv"]["kernel"]
    temp = jnp.exp(ap["temperature"].astype(jnp.float32))
    wq = (wqkv[:, :inner].astype(jnp.float32) * temp).astype(x.dtype)
    wqkv = jnp.concatenate([wq, wqkv[:, inner:].astype(x.dtype)], axis=-1)

    n = x.shape[1]
    eye = jnp.eye(n, dtype=bool)[None]
    bias = jnp.where(eye, mask_value(jnp.float32), 0.0).astype(jnp.float32)

    return fused_attention_block_bias(
        x,
        np_["scale"].astype(jnp.float32),
        np_["bias"].astype(jnp.float32),
        wqkv,
        ap["to_out"]["kernel"].astype(x.dtype),
        ap["to_out"]["bias"].astype(x.dtype),
        bias,
        heads,
        dim_head,
        1.0,
        norm.epsilon,
        interpret,
    )


def shift_4(x: jax.Array) -> list[jax.Array]:
    """Four zero-padded single-pixel shifts (reference :15-47): right, left,
    down, up — implemented as pad+slice (XLA lowers to cheap copies)."""
    pad = jnp.pad
    right = pad(x[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
    left = pad(x[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
    down = pad(x[:, :-1, :, :], ((0, 0), (1, 0), (0, 0), (0, 0)))
    up = pad(x[:, 1:, :, :], ((0, 0), (0, 1), (0, 0), (0, 0)))
    return [right, left, down, up]


# (group dy, dx) for the concat order [identity, *shift_4]: a shifted
# image's pixel (py, px) is the original's (py + dy, px + dx).
_SPT_OFFSETS = ((0, 0), (0, -1), (0, 1), (-1, 0), (1, 0))


def _spt_conv(x, gamma, beta, kernel, bias, p, eps):
    """The whole SPT — 5-way shifted concat, patchify, LayerNorm, Dense —
    as ONE stride-``p`` conv plus a per-patch affine correction.

    The eager pipeline materializes the (b, H, W, 5c) concat, patchifies it
    through a 6-D f32 transpose copy, and LayerNorms 5c·p² features per
    token — measured 6.9 ms/step of the small-dataset benchmark config's
    27.5 (profiles/small_dataset_vit.md), almost all of it HBM layout
    traffic.  But every shifted-patch feature v[j] is just an input pixel
    read at a fixed offset, so ``Dense(LN(v))`` expands to

        rstd · [(v ∘ γ) W]  −  rstd · μ · (γᵀW)  +  (βᵀW + b)

    where ``(v ∘ γ) W`` is a stride-p conv over the raw image whose
    (p+2, p+2, c, d) kernel carries γ-scaled Dense rows scatter-ADDED at
    each group's (dy, dx) offset (overlapping taps accumulate — identical
    sums, pixels never duplicated into HBM), and μ/σ come from a 2-channel
    stats conv with the tap-multiplicity kernel.  The conv's (1, 1) zero
    pad reproduces the shifts' boundary zero-fill exactly.
    """
    b, hh, ww, c = x.shape
    d = kernel.shape[-1]
    feat = p * p * 5 * c
    f32 = jnp.float32

    # (p·p·5c, d) Dense rows -> (p, p, 5, c, d), γ folded in f32.
    w5 = kernel.astype(f32).reshape(p, p, 5, c, d)
    g5 = gamma.astype(f32).reshape(p, p, 5, c)
    wg = w5 * g5[..., None]

    kk = p + 2
    wt = jnp.zeros((kk, kk, c, d), f32)
    mt = jnp.zeros((kk, kk, c, 1), f32)
    ones = jnp.ones((p, p, c, 1), f32)
    for gi, (dy, dx) in enumerate(_SPT_OFFSETS):
        sl = (slice(1 + dy, 1 + dy + p), slice(1 + dx, 1 + dx + p))
        wt = wt.at[sl].add(wg[:, :, gi])
        mt = mt.at[sl].add(ones)

    dn = ("NHWC", "HWIO", "NHWC")
    main = jax.lax.conv_general_dilated(
        x, wt.astype(x.dtype), (p, p), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=f32)

    x32 = x.astype(f32)
    s1 = jax.lax.conv_general_dilated(
        x32, mt, (p, p), [(1, 1), (1, 1)], dimension_numbers=dn)
    s2 = jax.lax.conv_general_dilated(
        x32 * x32, mt, (p, p), [(1, 1), (1, 1)], dimension_numbers=dn)
    mu = s1 / feat
    var = s2 / feat - mu * mu
    rstd = jax.lax.rsqrt(var + eps)

    gw = jnp.einsum("f,fd->d", gamma.astype(f32), kernel.astype(f32))
    bw = jnp.einsum("f,fd->d", beta.astype(f32), kernel.astype(f32)) \
        + bias.astype(f32)
    out = main * rstd - (mu * rstd) * gw + bw
    return out.reshape(b, (hh // p) * (ww // p), d).astype(x.dtype)


class SPT(nn.Module):
    """Shifted Patch Tokenization (reference :142-157).

    ``channels`` mirrors the reference constructor (README.md:861-869);
    Flax infers input widths, so it only documents the expected input.
    """

    dim: int
    patch_size: int
    channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = LayerNorm(dtype=self.dtype, name="norm")
        proj = Dense(self.dim, dtype=self.dtype, name="proj")
        p = self.patch_size
        if (os.environ.get("VIT_TPU_FUSED_SPT", "1") == "1"
                and x.ndim == 4 and x.shape[1] % p == 0
                and x.shape[2] % p == 0):
            # Bind the child params on a dummy token (identical tree /
            # transplant), then run the whole tokenizer as one conv —
            # see _spt_conv.
            c = x.shape[-1]
            dummy = jnp.zeros((1, 1, p * p * 5 * c), x.dtype)
            proj(norm(dummy))
            np_ = norm.variables["params"]
            pp = proj.variables["params"]
            return _spt_conv(x, np_["scale"], np_["bias"], pp["kernel"],
                             pp["bias"], p, norm.epsilon)
        x = jnp.concatenate([x, *shift_4(x)], axis=-1)
        x = patchify(x, p, p)
        x = norm(x)
        x = proj(x)
        return x


class LSA(nn.Module):
    """Locality Self-Attention (reference :88-121): learnable temperature,
    diagonal self-mask."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inner_dim = self.dim_head * self.heads
        temperature = self.param(
            "temperature",
            lambda key: jnp.log(jnp.asarray(self.dim_head ** -0.5, jnp.float32)),
        )

        qkv = Dense(inner_dim * 3, use_bias=False, dtype=self.dtype,
                    name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads),
            (q, k, v),
        )

        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * jnp.exp(temperature)
        n = dots.shape[-1]
        eye = jnp.eye(n, dtype=bool)
        dots = jnp.where(eye, mask_value(dots.dtype), dots)
        attn = jax.nn.softmax(dots, axis=-1)

        out = apply_attention(attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


class ViT(nn.Module):
    """Constructor parity: reference vit_for_small_dataset.py:160-172."""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Any = jnp.float32
    # Fused-MLP dispatch for the pre-norm MLP half ("auto"/"never"/
    # "interpret").
    fused_mlp: str = "auto"
    # Fused-attention dispatch for the LSA half: temperature and diagonal
    # mask fold into the block kernel's wqkv/bias operands (see
    # apply_fused_lsa_block).  "auto" gates exactly like the plain
    # Transformer's token-major tier; "never" keeps the eager LSA path.
    fused_attention: str = "auto"

    def __post_init__(self):
        super().__post_init__()
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        assert ih % ph == 0 and iw % pw == 0, \
            "Image dimensions must be divisible by the patch size."
        assert self.pool in {"cls", "mean"}, \
            "pool type must be either cls (cls token) or mean (mean pooling)"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        num_patches = (ih // ph) * (iw // pw)

        x = SPT(dim=self.dim, patch_size=ph, dtype=self.dtype,
                name="patch_embedding")(img, training=training)
        b, n, _ = x.shape

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches + 1, self.dim))

        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos_embedding[:, : (n + 1)].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)

        fa_tier = self.fused_attention != "never" and _fused_attention_tier(
            x, self.dropout, training, self.dtype, self.heads,
            self.dim_head, self.dim, self.fused_attention)

        for i in range(self.depth):
            a_norm = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")
            attn = LSA(self.dim, heads=self.heads, dim_head=self.dim_head,
                       dropout=self.dropout, dtype=self.dtype,
                       name=f"attn_{i}")
            if fa_tier == "bmajor":
                x = apply_fused_lsa_block(
                    a_norm, attn, x, self.heads, self.dim_head,
                    interpret=self.fused_attention == "interpret")
            else:
                x = x + attn(a_norm(x), training=training)
            norm = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}")
            mlp = MLP(self.dim, self.mlp_dim, dropout=self.dropout,
                      dtype=self.dtype, name=f"mlp_{i}")
            x = fused_mlp_residual(x, norm, mlp, self.dropout, training,
                                   self.dtype, self.fused_mlp)

        if self.pool == "mean":
            x = jnp.mean(x, axis=1)
        else:
            x = x[:, 0]

        x = LayerNorm(dtype=self.dtype, name="head_norm")(x)
        x = Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
