"""Shared L1/L2/L3 primitives.

The reference duplicates these in every model file (SURVEY.md §2.3); here
they exist once.  Numerics are pinned to the TF reference:

* GELU is the exact erf form, not the tanh approximation
  (reference vit.py:28-36 — the ``approximate`` branch is never used).
* LayerNorm uses Keras's default epsilon 1e-3 and biased variance
  (``tf.keras.layers.LayerNormalization`` defaults).
* Dense/Conv kernels init glorot-uniform, biases zero (Keras defaults).

Layout is NHWC throughout (TF parity; also the natural TPU conv layout).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from vit_tpu.ops.attention import scaled_dot_product_attention

Dtype = Any


def gelu_exact(x: jax.Array) -> jax.Array:
    """0.5·x·(1+erf(x/√2)) — reference vit.py:34."""
    return jax.nn.gelu(x, approximate=False)


glorot_uniform = nn.initializers.glorot_uniform()

# Keras-parity Dense / Conv: glorot-uniform kernels, zero biases.
Dense = functools.partial(nn.Dense, kernel_init=glorot_uniform)
Conv = functools.partial(nn.Conv, kernel_init=glorot_uniform)

# Keras-parity LayerNorm: epsilon defaults to 1e-3 in
# tf.keras.layers.LayerNormalization; exact (two-pass) variance for
# 1e-4 logit parity.
LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-3, use_fast_variance=False)


class Identity(nn.Module):
    """Pass-through (reference parallel_vit.py:29-34)."""

    @nn.compact
    def __call__(self, x, training: bool = False):
        return x


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of an NHWC feature map with *biased*
    variance — the hand-rolled LayerNorm the conv-hybrid models share
    (reference cvt.py:30-43, twins_svt.py:45-58, crossformer.py:74-87,
    scalable_vit.py:46-59, nest.py:28-41).  ``tf.math.reduce_variance``
    divides by N, hence biased; epsilon defaults to 1e-5 there.
    """

    dim: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        g = self.param("g", nn.initializers.ones, (1, 1, 1, self.dim))
        b = self.param("b", nn.initializers.zeros, (1, 1, 1, self.dim))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        out = (x32 - mean) / jnp.sqrt(var + self.eps) * g + b
        return out.astype(x.dtype)


class MLP(nn.Module):
    """Dense→GELU→Dropout→Dense→Dropout feed-forward (reference vit.py:24-47)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        x = Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return x


class Attention(nn.Module):
    """Canonical multi-head self-attention (reference vit.py:49-85).

    Fused qkv projection (no bias), scaled-dot-product over
    ``vit_tpu.ops.attention`` (flash kernel when eligible), output
    projection + dropout unless single-head with dim_head == dim.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inner_dim = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        qkv = Dense(inner_dim * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads), (q, k, v)
        )

        out = scaled_dot_product_attention(q, k, v, scale=self.dim_head ** -0.5)
        out = rearrange(out, "b h n d -> b n (h d)")

        if project_out:
            out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return out


def apply_fused_mlp_block(norm: nn.Module, mlp: nn.Module, x: jax.Array,
                          interpret: bool = False):
    """Run ``x + mlp(norm(x))`` through the fused Pallas block kernel using
    the params of already-declared ``LayerNorm`` and ``MLP`` submodules.

    The dummy calls declare the identical param tree (checkpoint/transplant
    compatible); their outputs are unused and dead-code-eliminated by XLA.
    """
    from vit_tpu.ops.fused_mlp import DEFAULT_BLOCK_T, fused_mlp_3d

    dummy = jnp.zeros((1, 1, x.shape[-1]), x.dtype)
    norm(dummy)
    mlp(dummy)
    np_ = norm.variables["params"]
    mp = mlp.variables["params"]
    return fused_mlp_3d(
        x,
        np_["scale"].astype(jnp.float32),
        np_["bias"].astype(jnp.float32),
        mp["fc1"]["kernel"].astype(x.dtype),
        mp["fc1"]["bias"].astype(x.dtype),
        mp["fc2"]["kernel"].astype(x.dtype),
        mp["fc2"]["bias"].astype(x.dtype),
        norm.epsilon,
        DEFAULT_BLOCK_T,
        interpret,
        # interpret is the test hook: pin the exact (lax.erf) math;
        # production uses the hardware-free tanh form (sub-bf16 deviation).
        "exact" if interpret else "tanh",
    )


def apply_fused_attention_block(norm: nn.Module, attn: nn.Module,
                                x: jax.Array, heads: int, dim_head: int,
                                interpret: bool = False):
    """Run ``x + attn(norm(x))`` through the fused attention-block kernel
    using the params of the declared ``LayerNorm``/``Attention`` pair
    (same dummy-declaration pattern as :func:`apply_fused_mlp_block`)."""
    from vit_tpu.ops.fused_attention_block import fused_attention_block

    dummy = jnp.zeros((1, 1, x.shape[-1]), x.dtype)
    norm(dummy)
    attn(dummy)
    np_ = norm.variables["params"]
    ap = attn.variables["params"]
    return fused_attention_block(
        x,
        np_["scale"].astype(jnp.float32),
        np_["bias"].astype(jnp.float32),
        ap["to_qkv"]["kernel"].astype(x.dtype),
        ap["to_out"]["kernel"].astype(x.dtype),
        ap["to_out"]["bias"].astype(x.dtype),
        heads,
        dim_head,
        None,
        norm.epsilon,
        interpret,
    )


def apply_fused_hybrid_layer(a_norm: nn.Module, attn: nn.Module,
                             m_norm: nn.Module, mlp: nn.Module,
                             x: jax.Array, heads: int, dim_head: int,
                             interpret: bool = False):
    """One full transformer layer on batch-in-sublane (n, b, d) activations:

    ``q,k,v = ln_gemm(x)`` → ``attention_nb`` → ``proj_mlp(x, oattn)``.

    All three stages are Pallas kernels chained in the default (n, b, ·)
    layout, so no relayout copies appear at any HBM boundary (an XLA
    attention middle measured ~8 layout conversions/layer ≈ 5-7 ms/step on
    B/32).  The row-wise pair absorbs both LayerNorms, the GELU, residuals
    and every bias/scale gradient; ``attention_nb`` keeps the n² matrix in
    VMEM.  Explicit-opt-in only — see ops/fused_hybrid.py for the measured
    reason auto dispatch never takes this path.
    """
    from vit_tpu.ops.fused_hybrid import (
        DEFAULT_BLOCK_T, attention_nb, ln_gemm, proj_mlp,
    )

    dummy = jnp.zeros((1, 1, x.shape[-1]), x.dtype)
    a_norm(dummy)
    attn(dummy)
    m_norm(dummy)
    mlp(dummy)
    anp = a_norm.variables["params"]
    ap = attn.variables["params"]
    mnp = m_norm.variables["params"]
    mp = mlp.variables["params"]

    n, b, d = x.shape
    inner = heads * dim_head
    gelu = "exact" if interpret else "tanh"

    x2 = x.reshape(n * b, d)
    q2, k2, v2 = ln_gemm(
        x2,
        anp["scale"].astype(jnp.float32),
        anp["bias"].astype(jnp.float32),
        ap["to_qkv"]["kernel"].astype(x.dtype),
        a_norm.epsilon,
        DEFAULT_BLOCK_T,
        interpret,
        3,  # separate q|k|v: head groups become lane-tile-aligned blocks
    )
    o = attention_nb(q2.reshape(n, b, inner), k2.reshape(n, b, inner),
                     v2.reshape(n, b, inner), heads, dim_head, None,
                     interpret)
    o2 = o.reshape(n * b, inner)
    z2 = proj_mlp(
        x2,
        o2,
        ap["to_out"]["kernel"].astype(x.dtype),
        ap["to_out"]["bias"].astype(x.dtype),
        mnp["scale"].astype(jnp.float32),
        mnp["bias"].astype(jnp.float32),
        mp["fc1"]["kernel"].astype(x.dtype),
        mp["fc1"]["bias"].astype(x.dtype),
        mp["fc2"]["kernel"].astype(x.dtype),
        mp["fc2"]["bias"].astype(x.dtype),
        m_norm.epsilon,
        DEFAULT_BLOCK_T,
        interpret,
        gelu,
    )
    return z2.reshape(n, b, d)


def _fused_attention_tier(x, dropout: float, training: bool, dtype,
                          heads: int, dim_head: int, dim: int,
                          mode: str = "auto"):
    """Which fused-attention path applies to (b, n, d) activations:
    ``False`` (XLA), ``"bmajor"`` (token-major blocks, 128 ≤ n ≤ 1024), or
    ``"nmajor"`` (batch-in-sublane blocks for short sequences — the whole
    encoder runs transposed to (n, b, d); see fused_attention_block)."""
    from vit_tpu.ops.fused_attention_block import (
        fused_attention_block_available,
    )

    project_out = not (heads == 1 and dim_head == dim)
    if x.ndim != 3 or (dropout > 0.0 and training) or not project_out:
        return False
    from vit_tpu.ops.fused_hybrid import _attn_pack

    b, n = x.shape[0], x.shape[1]
    if mode == "interpret":
        # CPU tests exercise both tiers: the hybrid (nmajor) layer at
        # short sequences — where production requires the explicit
        # "hybrid" opt-in — and the token-major block kernel above.
        if n < 128:
            return "nmajor" if _attn_pack(heads, dim_head) else False
        return "bmajor"
    if not (
        dtype in (jnp.bfloat16, jnp.float16)
        and x.dtype in (jnp.bfloat16, jnp.float16)
        and x.shape[-1] >= 128
        and fused_attention_block_available()
    ):
        return False
    # Token-major window: below ~128 tokens XLA lays activations out
    # batch-in-sublanes and every kernel boundary forces a relayout copy
    # (measured: B/32 regressed).  Above 512 the n² temporaries shrink the
    # batch block toward 1 (the VMEM math in _batch_per_program); bb=1
    # still fits and pays up to n=1024 (PiT stage 1: n=962, measured
    # round 3), beyond which flash territory begins.
    if mode == "bmajor":
        # Experimental force: token-major blocks outside the measured
        # window.  Exists so short-sequence retries (the B/32 n=65
        # headline) can be measured as the kernels improve — round 2's
        # rejection predates the bf16-operand dots, divisor blocks and
        # late-divide softmax (benchmarks/exp_b32_fused.py re-measures).
        return "bmajor"
    if 128 <= n <= 1024:
        return "bmajor"
    # Short-sequence window (n < 128): measured NOT to pay at the B/32
    # headline shape — the n-major↔image-major movement around the
    # attention middle is intrinsic (~250 us per q/k/v set whether paid as
    # in-kernel VPU transposes, XLA relayout copies, or strided per-image
    # gathers; all three designs measured within noise of each other) and
    # it cancels the row-kernel wins.  ``fused_attention="hybrid"`` opts in
    # explicitly (e.g. larger-batch inference at 80 <= n < 128); auto never
    # takes it.  Full measurements: ROUND2_NOTES.md.
    if mode == "hybrid" and n < 128 and b >= 64 and b * n >= 2048 \
            and _attn_pack(heads, dim_head):
        return "nmajor"
    return False


def _fused_mlp_min_d() -> int:
    """Smallest model dim the fused MLP dispatch accepts (lane-tile gate).

    Default 64: the on-chip shootout (benchmarks/exp_cmlp64.py, round 4)
    measured min_d=64 vs 128 on every hierarchical model whose stage-1
    conv-MLPs run at d=64 — twins_svt 26.04→23.46 ms/step (−9.9%),
    crossformer 25.39→23.58 (−7.1%), scalable_vit 46.22→44.23 (−4.3%).
    d=64 rows half-fill the lane tile but the row counts are huge
    (b·h·w ≥ 64·56·56) so the MXU stays fed and the fused epilogue
    (bias+GELU+residual in-kernel) beats XLA's unfused chain.  Still
    env-overridable for per-shape measurement.
    """
    import os
    return int(os.environ.get("VIT_TPU_FUSED_MLP_MIN_D", "64"))


def _fused_mlp_eligible(x, dropout: float, training: bool, dtype,
                        mode: str = "auto", nmajor: bool = False) -> bool:
    """x is (b, n, d) activations (pre-transpose shape even when the
    encoder will run in the nmajor layout — the MLP kernel flattens to
    rows either way, so only the gating differs)."""
    from vit_tpu.ops.fused_mlp import fused_mlp_available

    if x.ndim != 3 or (dropout > 0.0 and training):
        return False
    if mode == "interpret":  # test hook: Pallas interpreter, any backend/dtype
        return True
    if not (
        dtype in (jnp.bfloat16, jnp.float16)
        and x.dtype in (jnp.bfloat16, jnp.float16)
        # Narrow model dims (< half a lane tile, e.g. T2T's 27/147-dim
        # unfold stages) waste the MXU — XLA handles those better.  The
        # floor is overridable (VIT_TPU_FUSED_MLP_MIN_D) so the dispatch
        # threshold can be measured per-shape on-chip (exp_cmlp64.py);
        # 64 is the measured winner (see _fused_mlp_min_d).
        and x.shape[-1] >= _fused_mlp_min_d()
        and fused_mlp_available()
    ):
        return False
    if nmajor:
        # Inside the batch-in-sublane encoder there is no relayout at the
        # kernel boundary — gate only on enough rows to feed the MXU.
        return x.shape[0] * x.shape[1] >= 2048
    # Token-major: below ~128 tokens XLA lays activations out
    # batch-in-sublanes ({2,0,1}) and the kernel boundary forces relayout
    # copies that eat the win (measured: B/32 train regressed, B/16 n=197
    # gains 12%).  "bmajor" forces the kernel outside the window (see
    # _fused_attention_tier).
    return x.shape[1] >= 128 or mode == "bmajor"


def windowed_attention_eligible(folded_shape, folded_dtype, dropout: float,
                                training: bool, dtype,
                                mode: str = "auto") -> bool:
    """Gate for the windowed fused-attention path: ``folded_shape`` is the
    (groups, n_window, d) layout the caller will fold windows into.

    Unlike the token-major gate (128 ≤ n ≤ 1024), windows are tiny (49-196
    tokens) but the group axis counts thousands of window×image pairs, so
    the kernel's batch-block grid stays fed.  The XLA alternative
    materializes f32 (groups·heads, n, n) score maps in HBM — measured 21
    ms/step of softmax-chain traffic on Twins-SVT stage 1/2 alone
    (benchmarks/profiles/twins_svt.md)."""
    from vit_tpu.ops.fused_attention_block import (
        fused_attention_block_available,
    )

    groups, n, d = folded_shape
    if mode == "never" or (dropout > 0.0 and training):
        return False
    if mode == "interpret":
        return True
    return (
        dtype in (jnp.bfloat16, jnp.float16)
        and folded_dtype in (jnp.bfloat16, jnp.float16)
        and d >= 64
        and n <= 512
        and groups * n >= 2048
        and fused_attention_block_available()
    )


def fused_conv_mlp_residual(x: jax.Array, norm, mlp,
                            dropout: float, training: bool, dtype,
                            mode: str = "auto", eps: float = 1e-5,
                            fc1=None, fc2=None):
    """``x + mlp(norm(x))`` over an NHWC map through the fused MLP kernel,
    or ``None`` when ineligible (caller runs its exact path).

    The conv-hybrid models' MLPs are 1×1 convs — per-token GEMMs — so the
    token-major fused MLP block applies directly on the (b, H·W, c)
    bitcast view.  ``norm`` is a ``ChannelLayerNorm``; ``mlp`` holds 1×1
    ``Conv`` submodules under params ``fc1``/``fc2`` (the shared conv-MLP
    shape: reference twins_svt.py:78-92, nest.py:58-66).

    Pass ``norm=None`` when the LN lives *inside* ``mlp`` under the param
    name ``norm`` (CrossFormer's LN-inside MLP, crossformer.py:89-102);
    ``eps`` then supplies the epsilon.  Pass ``fc1``/``fc2`` Conv modules
    instead of ``mlp`` when the convs are loose (NesT, nest.py:58-66)."""
    b, H, W, c = x.shape
    x3 = x.reshape(b, H * W, c)
    if mode == "never" or not _fused_mlp_eligible(x3, dropout, training,
                                                  dtype, mode):
        return None
    from vit_tpu.ops.fused_mlp import DEFAULT_BLOCK_T, fused_mlp_3d

    dummy = jnp.zeros((1, 1, 1, c), x.dtype)
    if mlp is not None:
        mlp(dummy)
        mp = mlp.variables["params"]
    else:
        fc1(dummy)
        fc2(jnp.zeros((1, 1, 1, fc1.features), x.dtype))
        mp = {"fc1": fc1.variables["params"],
              "fc2": fc2.variables["params"]}
    if norm is not None:
        norm(dummy)
        np_ = norm.variables["params"]
        eps = norm.eps
    else:
        np_ = mp["norm"]
    w1 = mp["fc1"]["kernel"]
    hidden = w1.shape[-1]
    y = fused_mlp_3d(
        x3,
        np_["g"].reshape(-1).astype(jnp.float32),
        np_["b"].reshape(-1).astype(jnp.float32),
        w1.reshape(c, hidden).astype(x.dtype),
        mp["fc1"]["bias"].astype(x.dtype),
        mp["fc2"]["kernel"].reshape(hidden, c).astype(x.dtype),
        mp["fc2"]["bias"].astype(x.dtype),
        eps, DEFAULT_BLOCK_T, mode == "interpret",
        "exact" if mode == "interpret" else "tanh",
    )
    return y.reshape(b, H, W, c)


def fused_mlp_residual(x: jax.Array, norm: nn.Module, mlp: nn.Module,
                       dropout: float, training: bool, dtype,
                       mode: str = "auto") -> jax.Array:
    """``x + mlp(norm(x))`` with the Transformer's fused-MLP dispatch gate.

    For the custom encoders (CaiT/DeepViT/CrossViT/ParallelViT/
    patch-merger/small-dataset) whose attention differs from the shared
    ``Attention`` but whose MLP half is the standard pre-norm block:
    construct (don't call) the LayerNorm/MLP pair and route through here.
    The param tree is identical to the unfused path either way
    (checkpoint/transplant compatible).
    """
    if mode != "never" and _fused_mlp_eligible(x, dropout, training, dtype,
                                               mode):
        return apply_fused_mlp_block(norm, mlp, x,
                                     interpret=mode == "interpret")
    return x + mlp(norm(x), training=training)


class Transformer(nn.Module):
    """Pre-norm residual encoder stack (reference vit.py:87-104).

    The reference's Python layer loop becomes an unrolled jit-compiled loop
    (depths here are ≤26 — unrolling lets XLA fuse across layers; see
    SURVEY.md §3.1 rebuild mapping).

    On the 16-bit TPU path the LN→fc1→GELU→fc2→residual block runs through
    the fused Pallas kernel (``vit_tpu.ops.fused_mlp``) — same param tree,
    same math, one VMEM-resident pass instead of XLA's separate LN/GELU/bias
    round trips.  f32 models keep the exact XLA path the parity suite pins.
    ``fused_mlp='never'`` opts out.

    ``fused_attention`` modes: ``"auto"`` (token-major fused attention
    block in the measured 128 <= n <= 1024 window, XLA elsewhere),
    ``"hybrid"`` (additionally allows the batch-in-sublane short-sequence
    tier at n < 128 — measured NOT to pay at the B/32 headline shape, see
    ops/fused_hybrid.py), ``"interpret"`` (Pallas interpreter, tests),
    ``"never"``.
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    fused_mlp: str = "auto"
    fused_attention: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool = False):
        fa_tier = self.fused_attention != "never" and _fused_attention_tier(
            x, self.dropout, training, self.dtype, self.heads,
            self.dim_head, self.dim, self.fused_attention)
        nmajor = fa_tier == "nmajor"
        use_fused_mlp = self.fused_mlp != "never" and _fused_mlp_eligible(
            x, self.dropout, training, self.dtype, self.fused_mlp,
            nmajor=nmajor)
        if nmajor and not use_fused_mlp:
            # The hybrid layer fuses the MLP by construction — honor a
            # fused_mlp opt-out (or an ineligible MLP shape) by skipping
            # the tier entirely rather than silently fusing anyway.
            nmajor = False
            fa_tier = False
        if nmajor:
            # Short-sequence tier: the whole stack runs batch-in-sublane
            # (n, b, d) — byte-identical to the {2,0,1} layout XLA prefers
            # at n < 128, so kernels chain with no relayout copies.  The
            # two transposes here are the only layout traffic.
            x = jnp.swapaxes(x, 0, 1)
        for i in range(self.depth):
            a_norm = LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")
            attn = Attention(
                self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"attn_{i}",
            )
            norm = LayerNorm(dtype=self.dtype, name=f"mlp_norm_{i}")
            mlp = MLP(
                self.dim,
                self.mlp_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"mlp_{i}",
            )
            if nmajor:
                x = apply_fused_hybrid_layer(
                    a_norm, attn, norm, mlp, x, self.heads, self.dim_head,
                    interpret=self.fused_attention == "interpret")
                continue
            if fa_tier:
                x = apply_fused_attention_block(
                    a_norm, attn, x, self.heads, self.dim_head,
                    interpret=self.fused_attention == "interpret")
            else:
                x = x + attn(a_norm(x), training=training)
            if use_fused_mlp:
                x = apply_fused_mlp_block(
                    norm, mlp, x, interpret=self.fused_mlp == "interpret")
            else:
                x = x + mlp(norm(x), training=training)
        if nmajor:
            x = jnp.swapaxes(x, 0, 1)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference cct.py:74-103), PRNG-keyed
    instead of the reference's eager ``tf.rank(x).numpy()`` escape
    (SURVEY.md §8.5)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.rate == 0.0 or not training:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class GroupedConv(nn.Module):
    """Drop-in for ``Conv(..., feature_group_count=in_channels)`` — same
    param tree ("kernel"/"bias", same shapes and init) and the same
    ``lax`` forward, but with the SPMD-safe backward of
    ``vit_tpu.ops.depthwise.grouped_conv2d``: XLA's stock grouped-conv
    kernel gradient is M× too large when the computation is replicated
    over a size-M mesh axis (the TP `model` axis), which corrupted every
    depthwise conv under DP×TP."""

    features: int
    kernel_size: tuple
    strides: int = 1
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from flax.linen import dtypes as fdtypes

        from vit_tpu.ops.depthwise import grouped_conv2d

        kh, kw = self.kernel_size
        kernel = self.param("kernel", glorot_uniform,
                            (kh, kw, 1, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        x, kernel, bias = fdtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
        s = self.strides
        strides = (s, s) if isinstance(s, int) else tuple(s)
        out = grouped_conv2d(x, kernel, strides, self.padding)
        if bias is not None:
            out = out + bias
        return out


class PEG(nn.Module):
    """Positional Encoding Generator: residual depthwise 3×3 conv over the
    NHWC map (CPVT; reference twins_svt.py:108-115, regionvit.py:54-61,
    scalable_vit.py:80-87)."""

    dim: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = GroupedConv(
            self.dim,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            name="proj",
        )(x)
        return out + x


class DepthWiseConv2d(nn.Module):
    """Depthwise conv + optional BN + pointwise conv (reference pit.py:125-137;
    the CvT variant at cvt.py:79-92 adds BatchNorm between them)."""

    dim_in: int
    dim_out: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    use_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = GroupedConv(
            self.dim_in,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name="bn",
            )(x)
        x = Conv(
            self.dim_out,
            (1, 1),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="pointwise",
        )(x)
        return x


class Downsample(nn.Module):
    """3×3 stride-2 conv downsampling (reference regionvit.py:45-52,
    scalable_vit.py:71-78)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        return Conv(
            self.dim_out,
            (3, 3),
            strides=2,
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)


def batchnorm(training: bool, dtype=jnp.float32, name: Optional[str] = None, **kw):
    """Keras-parity BatchNorm: momentum 0.99, epsilon 1e-3
    (``tf.keras.layers.BatchNormalization`` defaults; used by LeViT/CvT/
    MobileViT/CCT conv stems)."""
    return nn.BatchNorm(
        use_running_average=not training,
        momentum=0.99,
        epsilon=1e-3,
        dtype=dtype,
        name=name,
        **kw,
    )


class PreNorm(nn.Module):
    """LayerNorm → fn (reference vit.py:14-22), for users composing custom
    encoders; the built-in models inline this for param-name clarity."""

    fn: nn.Module
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False, **kwargs):
        return self.fn(LayerNorm(dtype=self.dtype, name="norm")(x),
                       training=training, **kwargs)


class Residual(nn.Module):
    """fn(x) + x (reference twins_svt.py:37-43)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x, training: bool = False, **kwargs):
        return self.fn(x, training=training, **kwargs) + x
