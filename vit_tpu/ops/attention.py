"""Scaled-dot-product attention — the framework's single hottest op.

The reference implements one ``Attention`` class per variant file, each with
the same einsum pair at its core (reference vit.py:77,81).  Here there is ONE
op with hooks; variants that must materialize the attention matrix (DeepViT
re-attention, CaiT talking-heads) use the XLA path which XLA fuses well at
ViT sequence lengths.

Dispatch tiers (all measured on v5e — see ROUND2_NOTES.md):

=============  ==============================================================
n ≤ 2047       XLA.  At reference sequence lengths (every model in the zoo:
               n ≤ 257) XLA keeps the n² matrix in VMEM and wins outright;
               the *whole-block* Pallas kernels used by ``Transformer``
               (``fused_attention_block`` / ``fused_mlp``) fuse around it
               instead, for 16-bit models at 128 ≤ n.
2048 … 4096    ``flash_attention`` (v1): whole-K VMEM residency,
               1.15×/1.55× over XLA at n=2048/4096.
> 4096         ``flash_attention_v2``: grid-streamed K/V, unbounded n,
               1.9× at n=8192.
=============  ==============================================================

Both flash tiers differentiate through the streaming Pallas backward
(``vit_tpu.ops.flash_backward``; O(n) residuals).  The dispatch keys on
max(n_q, n_k); bias/mask always ride XLA.  ``vit_tpu.ops.short_attention``
(VMEM-resident short-sequence kernel) exists for explicit use but never
auto-dispatches — XLA beats it at the lengths it targets.

Softmax numerics: logits always accumulate in float32 (``preferred_element_type``).
For float32 models the whole softmax runs in float32.  For bfloat16 models the
n×n matrix is *stored* bfloat16 to halve its HBM traffic — exp goes through
f32 and the denominator is accumulated in f32 — but the max-subtraction and
the final normalize happen at bf16 storage precision.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Large-negative masking value, matching the reference's dtype-max convention
# (reference ats_vit.py:97, vit_for_small_dataset.py:112 use -np.finfo.max).
# Logits are always at least f32 here, so the value is computed at the
# promoted precision (finite in that dtype; -inf only if later downcast).
def mask_value(dtype) -> float:
    return -float(jnp.finfo(jnp.promote_types(dtype, jnp.float32)).max)


def _use_short(q, k, bias, mask) -> bool:
    # Measured on v5e (round 2): XLA's own attention keeps the n² matrix in
    # VMEM at these sizes (scores fusion ~0.12 ms/layer on B/16) and beats
    # the VMEM-resident Pallas kernel (0.18 vs 0.50 ms standalone at
    # b64·h12·n197·d64).  The short kernel stays available for explicit use
    # (`vit_tpu.ops.short_attention`) but never auto-dispatches.
    return False


def _use_flash(q, k, v, bias, mask) -> bool:
    from vit_tpu.ops import flash_attention as fa

    if not fa.flash_attention_available():
        return False
    d = q.shape[3]
    # The materialized matrix is n_q×n_k, so eligibility keys on the larger
    # of the two (cross-attention included).  Measured on v5e: at short ViT
    # sequences the XLA path (with the bf16-stored softmax) wins; the flash
    # kernels pay off once the n² matrix dominates HBM traffic — v1
    # (whole-K VMEM residency) 1.15×/1.55× at n=2048/4096, v2
    # (grid-streamed K/V) 1.9× at n=8192 and unbounded n.
    n = max(q.shape[2], k.shape[2])
    # Odd head dims (ScalableViT's dim_key 40) zero-pad to the 64-lane
    # block inside the dispatch — padding contributes 0 to every logit and
    # the padded output columns are sliced off, so only n gates here.
    if bias is not None or mask is not None:
        return False
    if q.shape[3] != v.shape[3]:
        # the flash kernels assume one head width for q/k/v
        return False
    if n >= 2048:
        return True
    # 16-bit tier: at n=1024 the XLA path's bf16-stored maps still cost
    # ~3.9 ms/layer vs ~1.6 through flash, measured in-model at the
    # ScalableViT stage-2 IWSA windows (profiles/scalable_vit.md).  f32
    # keeps the n>=2048 gate — double-width maps shift the crossover and
    # only the 16-bit case was measured.
    return n >= 1024 and q.dtype in (jnp.bfloat16, jnp.float16)


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    use_flash: str = "auto",
) -> jax.Array:
    """Attention over (batch, heads, seq, dim_head) tensors.

    Args:
      q, k, v: (b, h, n_q, d), (b, h, n_k, d), (b, h, n_k, d).
      scale: multiplier on logits; defaults to d ** -0.5 (reference vit.py:56).
      bias: additive logits bias, broadcastable to (b, h, n_q, n_k) — relative
        position biases (LeViT/RegionViT/CrossFormer) land here.
      mask: boolean, broadcastable to (b, h, n_q, n_k); False positions are
        masked out with -float32.max before softmax (reference ats_vit.py:200-205).
      use_flash: 'auto' | 'never' | 'force'.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if use_flash != "never" and _use_short(q, k, bias, mask):
        # Short-sequence tier (all reference models: n ≤ 257): whole
        # (head-batch, n, d) tiles VMEM-resident, O(n²) never in HBM.
        from vit_tpu.ops.short_attention import short_attention

        return short_attention(q, k, v, scale)

    if use_flash == "force":
        # The flash kernels have no bias/mask path — 'force' must not
        # silently drop them (the auto gate checks this; force bypasses it).
        assert bias is None and mask is None, (
            "use_flash='force' cannot carry a bias or mask")

    if use_flash != "never" and (use_flash == "force" or _use_flash(q, k, v, bias, mask)):
        # Zero-pad odd head dims to the 64-lane block: pad dims add 0 to
        # every q·k logit and the padded v columns come back as zeros,
        # sliced off below — exact same attention.  Multiples of 32 skip
        # the pad entirely: the kernels take d as-is (Mosaic lane-pads in
        # registers), and the explicit HBM pads are pure loss — measured
        # at the ScalableViT stage-1 IWSA shape (64,2,4096,32): 9.55 →
        # 8.32 ms/call device (benchmarks/exp_scalable_iwsa.py; the
        # kernel's own time is identical at d=32 and d=64 because MXU
        # contraction cycles don't shrink below the 128 fill).  d=96
        # checked on real Mosaic fwd+bwd (benchmarks/check_d96.py, r5)
        # and in interpret mode (tests/unit/test_flash_attention.py).
        d = q.shape[-1]
        d_pad = 0 if d % 32 == 0 else (-d) % 64
        if d_pad:
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad))
            q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        # v1 keeps full K/V VMEM-resident, so the tier choice keys on n_k.
        if k.shape[2] > 4096:
            # grid-streamed K/V kernel: unbounded n, 1.9× over XLA at n=8192
            from vit_tpu.ops.flash_attention_v2 import flash_attention_v2

            out = flash_attention_v2(q, k, v, scale=scale)
        else:
            from vit_tpu.ops import flash_attention as fa

            out = fa.flash_attention(q, k, v, scale=scale)
        return out[..., :d] if d_pad else out

    return _xla_attention(q, k, v, scale=scale, bias=bias, mask=mask)


def packed_window_attention(q, k, v, heads, *, scale=None, mode="auto"):
    """Attention over channel-packed ``(b, n, heads*d)`` q/k/v (packed out).

    Conv-produced q/k/v arrive NHWC channel-packed; routing them through the
    head-major kernel costs a head-split transpose in and a head-merge out
    (~2.5 ms/step at ScalableViT's whole-map stages,
    profiles/scalable_vit.md:66-68).  When the flash tier fires this calls
    the packed kernel — heads unrolled in-kernel with static lane slices —
    and the layout copies vanish; otherwise it falls back to the head-major
    dispatcher, so callers see one function with the same tiers as
    :func:`scaled_dot_product_attention`.

    ``mode``: 'auto' | 'never' | 'force' | 'interpret' (tests on CPU).
    """
    from vit_tpu.ops.flash_attention_packed import (
        flash_attention_packed, flash_attention_packed_available)

    b, n, hdk = q.shape
    assert hdk % heads == 0 and v.shape[2] % heads == 0
    if scale is None:
        scale = (hdk // heads) ** -0.5
    nk_max = max(n, k.shape[1])
    if mode == "interpret":
        return flash_attention_packed(q, k, v, heads, scale, True)
    # Same tiers as _use_flash, plus the v1 whole-K VMEM residency cap.
    if (mode != "never" and flash_attention_packed_available()
            and nk_max <= 4096
            and (mode == "force" or nk_max >= 2048
                 or (nk_max >= 1024
                     and q.dtype in (jnp.bfloat16, jnp.float16)))):
        return flash_attention_packed(q, k, v, heads, scale)

    def split(t):
        return t.reshape(b, t.shape[1], heads,
                         t.shape[2] // heads).transpose(0, 2, 1, 3)

    out = scaled_dot_product_attention(split(q), split(k), split(v),
                                       scale=scale,
                                       use_flash="never" if mode == "never"
                                       else "auto")
    return out.transpose(0, 2, 1, 3).reshape(b, n, v.shape[2])


def softmax_lastdim(logits, out_dtype):
    """Softmax over the last axis with the production storage policy.

    bfloat16 output: half-traffic softmax — the materialized n×n matrix is
    the HBM bottleneck at ViT sequence lengths (profiled at ~half the
    device time of a B/16 forward when stored f32).  exp accumulates
    through f32 and the denominator sums in f32 (bf16 loses precision over
    thousands of terms); only the reciprocal is rounded back, so the n×n
    matrix itself stays bf16.  Other dtypes keep the exact f32 path.
    """
    if out_dtype == jnp.bfloat16:
        logits = logits.astype(jnp.bfloat16)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
        den = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        return e * (1.0 / den).astype(jnp.bfloat16)
    return jax.nn.softmax(logits, axis=-1).astype(out_dtype)


def _xla_attention(q, k, v, *, scale, bias=None, mask=None):
    out_dtype = q.dtype
    logits = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, mask_value(logits.dtype))

    attn = softmax_lastdim(logits, out_dtype)
    out = jnp.einsum(
        "bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def attention_weights(
    q: jax.Array,
    k: jax.Array,
    *,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Materialized post-softmax attention matrix (float32).

    For variants that transform the attention matrix itself: DeepViT
    re-attention (reference deepvit.py:82-84), CaiT talking-heads (reference
    cait.py:123-125), ATS token scoring (reference ats_vit.py:81-90).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, mask_value(logits.dtype))
    return jax.nn.softmax(logits, axis=-1)


def apply_attention(attn: jax.Array, v: jax.Array) -> jax.Array:
    """attn @ v for a materialized attention matrix."""
    out = jnp.einsum(
        "bhij,bhjd->bhid", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)
