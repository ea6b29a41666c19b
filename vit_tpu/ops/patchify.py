"""Patch extraction ops.

The linear patch embedding (reference vit.py:141-144 — einops Rearrange +
Dense) lowers here to a reshape/transpose that XLA fuses directly into the
embedding matmul: one strided-reshape GEMM on the MXU, no materialized
intermediate (BASELINE.json: "patchify+linear embedding becomes a single
strided-reshape matmul kernel").

``extract_patches`` reproduces ``tf.image.extract_patches`` semantics
(reference t2t.py:42, pit.py:119) for the unfold tokenizers, including TF
'SAME' asymmetric padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def patchify(img: jax.Array, patch_height: int, patch_width: int) -> jax.Array:
    """NHWC image → (b, num_patches, p1*p2*c) tokens.

    Equivalent to einops 'b (h p1) (w p2) c -> b (h w) (p1 p2 c)'
    (reference vit.py:142).
    """
    return rearrange(
        img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
        p1=patch_height, p2=patch_width,
    )


def patch_embed(img: jax.Array, kernel: jax.Array, bias: jax.Array,
                patch_height: int, patch_width: int) -> jax.Array:
    """Fused patchify + linear embedding: NHWC image → (b, n, dim) tokens.

    Same math as ``patchify(img, ph, pw) @ kernel + bias`` (reference
    vit.py:141-144) — but expressed as a 5-D einsum over all-bitcast views
    so XLA contracts (p1, p2·c) directly instead of fusing the 6-D patch
    transpose into the GEMM.  Measured on v5e (bf16): the fused-transpose
    GEMM runs at ~40% MXU rate at patch 32 (845 us for B/32 @256), while
    this form hits 437 us; at patch 16 the fused form is already fine
    (317 vs 344 us), so callers gate on ``patch_embed_wins``.
    """
    b, hh, ww, c = img.shape
    gh, gw = hh // patch_height, ww // patch_width
    d = kernel.shape[-1]
    # rows (hh) = (gh, p1) and lanes (ww·c) = (gw, p2·c): pure bitcasts.
    x5 = img.reshape(b, gh, patch_height, gw, patch_width * c)
    w3 = kernel.reshape(patch_height, patch_width * c, d)
    out = jnp.einsum("bgpjl,pld->bgjd", x5, w3,
                     preferred_element_type=jnp.float32)
    return (out.reshape(b, gh * gw, d) + bias).astype(img.dtype)


def patch_embed_wins(patch_height: int, patch_width: int, channels: int = 3,
                     ) -> bool:
    """Whether the einsum form beats XLA's fused-transpose GEMM — measured
    crossover is patch_dim ≥ ~1536 (patch 32 wins ×1.9, patch 16 loses 9%)."""
    return patch_height * patch_width * channels >= 1536


def unpatchify(tokens: jax.Array, h: int, w: int, patch_height: int,
               patch_width: int, channels: int) -> jax.Array:
    """Inverse of :func:`patchify`."""
    return rearrange(
        tokens, "b (h w) (p1 p2 c) -> b (h p1) (w p2) c",
        h=h, w=w, p1=patch_height, p2=patch_width, c=channels,
    )


def _same_pads(size: int, kernel: int, stride: int) -> tuple[int, int]:
    """TF 'SAME' asymmetric padding amounts (pad_before, pad_after)."""
    out = -(-size // stride)
    pad = max(0, (out - 1) * stride + kernel - size)
    return pad // 2, pad - pad // 2


def extract_patches(
    img: jax.Array,
    kernel: int,
    stride: int,
    padding: str = "SAME",
) -> jax.Array:
    """``tf.image.extract_patches`` equivalent on NHWC input.

    Returns (b, out_h, out_w, kernel*kernel*c) with the same channel
    ordering TF produces: for each output position, patch rows are
    contiguous, each row holding ``kernel * c`` values.
    """
    b, h, w, c = img.shape
    if padding == "SAME":
        ph = _same_pads(h, kernel, stride)
        pw = _same_pads(w, kernel, stride)
        img = jnp.pad(img, ((0, 0), ph, pw, (0, 0)))
    elif isinstance(padding, (tuple, list)):
        img = jnp.pad(img, ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0)))
    elif padding != "VALID":
        raise ValueError(f"unknown padding {padding!r}")

    b, hp, wp, c = img.shape
    out_h = (hp - kernel) // stride + 1
    out_w = (wp - kernel) // stride + 1

    # Gather kernel×kernel shifted strided views; XLA turns this into cheap
    # slices (static shapes) rather than a real gather.
    rows = []
    for di in range(kernel):
        cols = []
        for dj in range(kernel):
            view = jax.lax.slice(
                img,
                (0, di, dj, 0),
                (b, di + (out_h - 1) * stride + 1, dj + (out_w - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            cols.append(view)
        rows.append(jnp.concatenate(cols, axis=-1))
    return jnp.concatenate(rows, axis=-1)
