"""Hybrid fused layer kernels for short sequences — the B/32-class path.

At the headline ViT-B/32 shape (n=65 tokens, reference vit.py:181-194) XLA
computes the attention einsums themselves near-optimally (the n² matrix
lives in VMEM), but everything *around* them bleeds time: profiled on v5e,
a 23.8 ms device step spends 3.8 ms in layout-churn copies, 3.2 ms in
LayerNorm-backward reduce fusions, ~2.9 ms in bias-gradient reductions and
~1 ms in GELU/residual overhead.  Monolithic attention-block kernels are no
answer here: with 16 images × 16 heads of (65×64)·(64×65) dots per program,
the Mosaic compile blows up (measured 330 s per kernel, OOM-killed at model
scope).

So this file splits each transformer layer around XLA's attention middle
into two *row-wise* Pallas kernels that stream token blocks — no per-image
dots inside, so they compile like ``fused_mlp`` and run at GEMM speed:

* :func:`ln_gemm` — ``LN(x)·γβ @ w`` (the qkv projection with its LayerNorm
  fused; custom VJP fuses the LN backward + dgamma/dbeta).
* :func:`proj_mlp` — ``y = x + oattn @ wo + bo`` followed by
  ``y + fc2(gelu(fc1(LN(y))))``: attention output projection, both
  residuals, second LayerNorm and the whole MLP in one pass (custom VJP
  fuses dgelu, the three dgrad GEMMs, the LN backward and all five
  bias/scale gradient accumulations).

The layer then runs qkv = ln_gemm(x) → attention_nb → proj_mlp(x, oattn),
with activations carried in the batch-in-sublane (n, b, d) layout that XLA
prefers at n < 128 (``vit_tpu.layers.common.Transformer`` transposes once
around the whole stack).  Weight gradients remain near-peak XLA GEMMs over
residuals the kernels re-emit.

MEASURED OUTCOME (v5e, B/32 train, batch 128 — full numbers in
ROUND2_NOTES.md): the row-wise pair runs at ~93% of the bare-GEMM floor,
but the whole tier does NOT beat the pure-XLA step at n=65.  The
n-major↔image-major movement around the attention middle is intrinsic —
~250 us per q/k/v set whether paid as in-kernel VPU transposes, XLA
relayout copies (the XLA-middle variant), or strided per-image gathers —
and Mosaic requires dot_general batch dims at position 0, so it cannot be
folded into the dots.  The tier is therefore explicit-opt-in
(``fused_attention="hybrid"``), kept for regimes where attention is a
smaller fraction of the layer (e.g. 80 <= n < 128 at large batch).

Numerics follow ``vit_tpu.ops.fused_mlp``: f32 accumulation everywhere,
activations stored in the input dtype, GELU selectable (hardware-tanh in
production, exact lax.erf under the interpreter tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vit_tpu.ops.fused_mlp import (
    _VMEM_LIMIT,
    _dgelu,
    _gelu,
    _ln_stats,
    _pad_tokens,
    _sublane,
    fused_mlp_available,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

DEFAULT_BLOCK_T = 512


def fused_hybrid_available() -> bool:
    return _PALLAS_OK and fused_mlp_available()


def _fit_block_t(block_t: int, weight_bytes: int, per_row_bytes: int,
                 itemsize: int, t: int, dt) -> int:
    """Largest VMEM-fitting token block, preferring one that divides ``t``
    exactly — a dividing block kills the explicit pad/slice ops around the
    kernel (profiled at ~1.8 ms/step on B/32 with non-dividing blocks)."""
    budget = _VMEM_LIMIT // 2 - weight_bytes
    cap = min(block_t, max(budget // max(2 * per_row_bytes, 1), 16))
    sub = _sublane(dt)
    if t <= cap:
        return max(sub, t)
    best = 0
    for cand in range(cap - cap % sub, sub - 1, -sub):
        if t % cand == 0:
            best = cand
            break
    if best >= cap // 4:  # don't trade a tiny grid block for padding
        return best
    while block_t > 16 and block_t > cap:
        block_t //= 2
    return min(block_t, max(sub, t))


# =====================================================================
# ln_gemm: out = (LN(x)·γ + β) @ w
# =====================================================================

def _ln_gemm_fwd_kernel(x_ref, g_ref, b_ref, w_ref, *out_refs, eps,
                        save_xn):
    if save_xn:
        *split_refs, xn_ref = out_refs
    else:
        split_refs, xn_ref = out_refs, None
    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mu, rstd = _ln_stats(x32, eps)
    xn = ((x32 - mu) * rstd * g_ref[:].astype(jnp.float32)
          + b_ref[:].astype(jnp.float32)).astype(x.dtype)
    if xn_ref is not None:
        xn_ref[:] = xn
    out = jnp.dot(xn, w_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    cols = out.shape[1] // len(split_refs)
    for s, ref in enumerate(split_refs):
        ref[:] = out[:, s * cols:(s + 1) * cols]


def _ln_gemm_bwd_kernel(*refs, eps, nsplit):
    douts = refs[:nsplit]
    x_ref, g_ref, wt_ref, dx_ref, dg_ref, db_ref = refs[nsplit:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dout = jnp.concatenate([r[:] for r in douts], axis=-1) \
        if nsplit > 1 else douts[0][:]
    x32 = x_ref[:].astype(jnp.float32)
    dxn = jnp.dot(dout, wt_ref[:], preferred_element_type=jnp.float32)

    mu, rstd = _ln_stats(x32, eps)
    xhat = (x32 - mu) * rstd
    dxhat = dxn * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (dxhat - m1 - xhat * m2)).astype(dout.dtype)

    dg_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)


def _ln_gemm_forward(x, gamma, beta, w, eps, block_t, interpret, nsplit,
                     save_xn=True):
    t, d = x.shape
    dout = w.shape[1]
    cols = dout // nsplit
    dt = x.dtype
    weight_bytes = d * dout * dt.itemsize
    per_row = (2 * d + dout) * dt.itemsize + (d + dout) * 4
    block_t = _fit_block_t(block_t, weight_bytes, per_row, dt.itemsize, t, dt)
    xp = _pad_tokens(x, block_t)
    tp = xp.shape[0]
    row = lambda a: a.reshape(1, -1)

    xn_specs = [
        pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] if save_xn else []
    xn_shapes = [jax.ShapeDtypeStruct((tp, d), dt)] if save_xn else []
    out = pl.pallas_call(
        functools.partial(_ln_gemm_fwd_kernel, eps=eps, save_xn=save_xn),
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(nsplit)
        ] + xn_specs,
        out_shape=[
            jax.ShapeDtypeStruct((tp, cols), dt) for _ in range(nsplit)
        ] + xn_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * d * dout,
            bytes_accessed=(2 * tp * d + tp * dout + d * dout) * dt.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, row(gamma).astype(dt), row(beta).astype(dt), w)
    if not save_xn:
        return tuple(s[:t] for s in out), None
    *splits, xn = out
    return tuple(s[:t] for s in splits), xn[:t]


def _ln_gemm_backward(douts, x, gamma, w, eps, block_t, interpret, nsplit):
    t, d = x.shape
    dcol = w.shape[1]
    cols = dcol // nsplit
    dt = x.dtype
    weight_bytes = d * dcol * dt.itemsize
    per_row = (2 * d + dcol) * dt.itemsize + 2 * d * 4
    block_t = _fit_block_t(block_t, weight_bytes, per_row, dt.itemsize, t, dt)
    doutps = [_pad_tokens(g, block_t) for g in douts]
    xp = _pad_tokens(x, block_t)
    tp = xp.shape[0]
    wt = w.T

    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_gemm_bwd_kernel, eps=eps, nsplit=nsplit),
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(nsplit)
        ] + [
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dcol, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, d), dt),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * d * dcol,
            bytes_accessed=(2 * tp * d + tp * dcol + d * dcol) * dt.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*doutps, xp, gamma.reshape(1, -1).astype(dt), wt)
    return dx[:t], dg.reshape(-1), db.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def ln_gemm(x, gamma, beta, w, eps: float = 1e-3,
            block_t: int = DEFAULT_BLOCK_T, interpret: bool = False,
            nsplit: int = 1):
    """``(LN(x)·γ + β) @ w`` over (tokens, d) rows — the fused pre-norm
    projection (reference vit.py:21-22 + 63, the LN→to_qkv pair).

    ``nsplit > 1`` returns the output columns as that many equal arrays
    (e.g. 3 for q|k|v): separate outputs let the attention middle consume
    q/k/v without XLA materializing lane-slice copies of a fused qkv."""
    out, _ = _ln_gemm_forward(x, gamma, beta, w, eps, block_t, interpret,
                              nsplit, save_xn=False)
    return out if nsplit > 1 else out[0]


def _ln_gemm_vjp_fwd(x, gamma, beta, w, eps, block_t, interpret, nsplit):
    out, xn = _ln_gemm_forward(x, gamma, beta, w, eps, block_t, interpret,
                               nsplit)
    return (out if nsplit > 1 else out[0]), (x, xn, gamma, w)


def _ln_gemm_vjp_bwd(eps, block_t, interpret, nsplit, res, dout):
    x, xn, gamma, w = res
    douts = list(dout) if nsplit > 1 else [dout]
    dx, dg, db = _ln_gemm_backward(douts, x, gamma, w, eps, block_t,
                                   interpret, nsplit)
    # dW: one near-peak GEMM per split over the saved normalized rows;
    # weight-space concat is tiny next to a (rows × dcol) activation concat.
    dws = [
        jax.lax.dot_general(
            xn, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w.dtype)
        for g in douts
    ]
    dw = jnp.concatenate(dws, axis=1) if nsplit > 1 else dws[0]
    return (dx, dg, db, dw)


ln_gemm.defvjp(_ln_gemm_vjp_fwd, _ln_gemm_vjp_bwd)


# =====================================================================
# attention_nb: multi-head attention over (n, b, heads·dh) q/k/v rows
# =====================================================================
#
# The attention middle as its OWN kernel, consuming and producing the
# default (n, b, ·) layout its ln_gemm/proj_mlp neighbours use — so the
# whole layer chains Pallas→Pallas with zero relayout copies (an XLA
# attention middle costs ~8 layout conversions/layer ≈ 3-6 ms/step on
# B/32, measured).  Kept separate from the projections because Mosaic's
# compile time explodes superlinearly with whole-kernel size (a monolithic
# LN+qkv+attention+out kernel took 176 s fwd / 428 s bwd to compile; each
# section alone compiles in seconds).
#
# Structure: the grid runs over (batch blocks × head groups) and the HEAD
# axis is blocked by the BlockSpec lane dimension — ``pack`` heads of
# dh lanes form one 128-lane tile (two d=64 heads per program: the lane
# packing VERDICT.md asked for).  q/k/v arrive as SEPARATE arrays (from
# ``ln_gemm(nsplit=3)``), so a head group is a plain lane-tile-aligned
# block and the kernel never slices a 3·inner-wide buffer.  Everything a
# program touches is a few hundred KB — earlier designs that staged
# per-head slices of whole-qkv blocks through VMEM scratch blew the 64M
# scoped-VMEM budget at the B/32 production shape (78-95M).

def _attn_pack(heads: int, dim_head: int):
    """Heads per 128-lane block, or None if this head geometry can't tile
    lanes exactly (dispatch then falls back to the XLA path)."""
    if dim_head >= 128 and dim_head % 128 == 0:
        return 1
    if dim_head < 128 and 128 % dim_head == 0 and heads % (128 // dim_head) == 0:
        return 128 // dim_head
    return None


def _attn_nb_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, pack, dim_head,
                        scale, out_dtype):
    n, bb, _ = q_ref.shape
    qb = jnp.swapaxes(q_ref[:], 0, 1)  # (bb, n, pack·dh) — a ~KB-scale swap
    kb = jnp.swapaxes(k_ref[:], 0, 1)
    vb = jnp.swapaxes(v_ref[:], 0, 1)
    outs = []
    for p in range(pack):
        sl = slice(p * dim_head, (p + 1) * dim_head)
        q = qb[:, :, sl]
        k = kb[:, :, sl]
        v = vb[:, :, sl]
        # Dots stay in the input dtype with f32 ACCUMULATION — explicit f32
        # operand casts forced f32-rate MXU matmuls (measured +6% kernel
        # time at B/32); the scale folds into the f32 logits instead.
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (bb, n, n) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p_ = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(out_dtype)
        outs.append(jax.lax.dot_general(
            p_, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(out_dtype))
    ob = outs[0] if pack == 1 else jnp.concatenate(outs, axis=-1)
    o_ref[:] = jnp.swapaxes(ob, 0, 1)  # back to (n, bb, pack·dh)


def _attn_nb_bwd_kernel(do_ref, q_ref, k_ref, v_ref,
                        dq_ref, dk_ref, dv_ref, *, pack, dim_head, scale,
                        out_dtype):
    n, bb, _ = q_ref.shape
    qb = jnp.swapaxes(q_ref[:], 0, 1)
    kb = jnp.swapaxes(k_ref[:], 0, 1)
    vb = jnp.swapaxes(v_ref[:], 0, 1)
    dob = jnp.swapaxes(do_ref[:], 0, 1)
    dqs, dks, dvs = [], [], []
    for p in range(pack):
        sl = slice(p * dim_head, (p + 1) * dim_head)
        q = qb[:, :, sl]
        k = kb[:, :, sl]
        v = vb[:, :, sl]
        do = dob[:, :, sl]
        # Input-dtype dots with f32 accumulation throughout (see the fwd
        # kernel); probability/score intermediates stay f32 on the VPU and
        # round to the storage dtype only where they feed an MXU operand.
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p_ = e / jnp.sum(e, axis=-1, keepdims=True)  # (bb, n, n) f32
        pd = p_.astype(out_dtype)
        dv = jax.lax.dot_general(
            pd, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # pᵀ @ do
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dsum = jnp.sum(dp * p_, axis=-1, keepdims=True)
        ds = (p_ * (dp - dsum) * scale).astype(out_dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # dsᵀ @ q
        dqs.append(dq.astype(out_dtype))
        dks.append(dk.astype(out_dtype))
        dvs.append(dv.astype(out_dtype))
    cat = lambda xs: xs[0] if pack == 1 else jnp.concatenate(xs, axis=-1)
    dq_ref[:] = jnp.swapaxes(cat(dqs), 0, 1)
    dk_ref[:] = jnp.swapaxes(cat(dks), 0, 1)
    dv_ref[:] = jnp.swapaxes(cat(dvs), 0, 1)


def _attn_nb_block_b(n, b, dt) -> int:
    """Images per program — sublane-tiled; per-program VMEM is a few MB at
    most (4-7 blocks of (n, bb, 128) plus f32 n² temps), so bb=16 is safe
    far beyond any reference shape and keeps the MXU fed."""
    sub = _sublane(dt)
    bb = min(16, b)
    return max(sub, bb // sub * sub)


def _attn_nb_forward(q, k, v, heads, dim_head, scale, interpret):
    n, b, inner = q.shape
    pack = _attn_pack(heads, dim_head)
    assert pack is not None, (heads, dim_head)
    lanes = pack * dim_head
    dt = q.dtype
    bb = _attn_nb_block_b(n, b, dt)
    pad = (-b) % bb
    if pad:
        q, k, v = (jnp.pad(t, ((0, 0), (0, pad), (0, 0))) for t in (q, k, v))
    bp = q.shape[1]

    blk = pl.BlockSpec((n, bb, lanes), lambda i, g: (0, i, g),
                       memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        functools.partial(_attn_nb_fwd_kernel, pack=pack, dim_head=dim_head,
                          scale=scale, out_dtype=dt),
        grid=(bp // bb, heads // pack),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, bp, inner), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * heads * n * n * dim_head,
            bytes_accessed=4 * bp * n * inner * dt.itemsize,
            transcendentals=bp * heads * n * n,
        ),
        interpret=interpret,
    )(q, k, v)
    return o[:, :b] if pad else o


def _attn_nb_backward(do, q, k, v, heads, dim_head, scale, interpret):
    n, b, inner = q.shape
    pack = _attn_pack(heads, dim_head)
    lanes = pack * dim_head
    dt = q.dtype
    bb = _attn_nb_block_b(n, b, dt)
    pad = (-b) % bb
    if pad:
        do, q, k, v = (jnp.pad(t, ((0, 0), (0, pad), (0, 0)))
                       for t in (do, q, k, v))
    bp = q.shape[1]

    blk = pl.BlockSpec((n, bb, lanes), lambda i, g: (0, i, g),
                       memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_nb_bwd_kernel, pack=pack, dim_head=dim_head,
                          scale=scale, out_dtype=dt),
        grid=(bp // bb, heads // pack),
        in_specs=[blk, blk, blk, blk],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((n, bp, inner), dt)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=10 * bp * heads * n * n * dim_head,
            bytes_accessed=7 * bp * n * inner * dt.itemsize,
            transcendentals=bp * heads * n * n,
        ),
        interpret=interpret,
    )(do, q, k, v)
    if pad:
        return dq[:, :b], dk[:, :b], dv[:, :b]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def attention_nb(q, k, v, heads: int, dim_head: int, scale: float = None,
                 interpret: bool = False):
    """Multi-head self-attention over q/k/v in the (n, b, heads·dh)
    batch-in-sublane layout (reference vit.py:72-81, the einsum pair).

    Softmax runs entirely in f32 on-chip; the n×n matrix never reaches HBM
    (O(n²) stays in VMEM — the short-sequence regime, n < 128).  Requires
    ``_attn_pack(heads, dim_head)`` — callers gate dispatch on it.
    """
    if scale is None:
        scale = dim_head ** -0.5
    return _attn_nb_forward(q, k, v, heads, dim_head, scale, interpret)


def _attn_nb_vjp_fwd(q, k, v, heads, dim_head, scale, interpret):
    if scale is None:
        scale = dim_head ** -0.5
    o = _attn_nb_forward(q, k, v, heads, dim_head, scale, interpret)
    return o, (q, k, v)


def _attn_nb_vjp_bwd(heads, dim_head, scale, interpret, res, do):
    q, k, v = res
    if scale is None:
        scale = dim_head ** -0.5
    return _attn_nb_backward(do, q, k, v, heads, dim_head, scale, interpret)


attention_nb.defvjp(_attn_nb_vjp_fwd, _attn_nb_vjp_bwd)


# =====================================================================
# proj_mlp: y = x + o @ wo + bo ;  z = y + fc2(gelu(fc1(LN(y)·γ + β)))
# =====================================================================

def _proj_mlp_fwd_kernel(x_ref, o_ref, wo_ref, bo_ref, g_ref, b_ref,
                         w1_ref, b1_ref, w2_ref, b2_ref,
                         z_ref, y_ref, xn_ref, h_ref, *, eps, gelu):
    x = x_ref[:]
    y32 = jnp.dot(o_ref[:], wo_ref[:], preferred_element_type=jnp.float32) \
        + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
    y = y32.astype(x.dtype)
    y_ref[:] = y

    mu, rstd = _ln_stats(y32, eps)
    xn = ((y32 - mu) * rstd * g_ref[:].astype(jnp.float32)
          + b_ref[:].astype(jnp.float32)).astype(x.dtype)
    if xn_ref is not None:
        xn_ref[:] = xn

    h32 = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    if h_ref is not None:
        h_ref[:] = h32.astype(x.dtype)
    g32 = _gelu(h32, gelu)

    o32 = jnp.dot(g32.astype(x.dtype), w2_ref[:],
                  preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)
    z_ref[:] = y + o32.astype(x.dtype)


def _proj_mlp_bwd_kernel(dz_ref, y_ref, h_ref, g_ref,
                         wot_ref, w1t_ref, w2t_ref,
                         dy_ref, do_ref, dh_ref, gact_ref,
                         dg_ref, db_ref, dbo_ref, db1_ref, db2_ref,
                         *, eps, gelu):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dz = dz_ref[:]
    dz32 = dz.astype(jnp.float32)
    y32 = y_ref[:].astype(jnp.float32)
    h32 = h_ref[:].astype(jnp.float32)

    # MLP dgrads
    dgelu_in = jnp.dot(dz, w2t_ref[:], preferred_element_type=jnp.float32)
    dh32 = dgelu_in * _dgelu(h32, gelu)
    dh = dh32.astype(dz.dtype)
    dh_ref[:] = dh
    gact_ref[:] = _gelu(h32, gelu).astype(dz.dtype)

    dxn32 = jnp.dot(dh, w1t_ref[:], preferred_element_type=jnp.float32)

    # LayerNorm backward over y
    mu, rstd = _ln_stats(y32, eps)
    xhat = (y32 - mu) * rstd
    dxhat = dxn32 * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dy32 = dz32 + rstd * (dxhat - m1 - xhat * m2)
    dy = dy32.astype(dz.dtype)
    dy_ref[:] = dy

    # attention-out projection dgrad
    do_ref[:] = jnp.dot(dy, wot_ref[:],
                        preferred_element_type=jnp.float32).astype(dz.dtype)

    dg_ref[:] += jnp.sum(dxn32 * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dxn32, axis=0, keepdims=True)
    dbo_ref[:] += jnp.sum(dy32, axis=0, keepdims=True)
    db1_ref[:] += jnp.sum(dh32, axis=0, keepdims=True)
    db2_ref[:] += jnp.sum(dz32, axis=0, keepdims=True)


def _proj_mlp_forward(x, o, wo, bo, gamma, beta, w1, b1, w2, b2,
                      eps, block_t, interpret, gelu, save_residuals=True):
    t, d = x.shape
    inner = wo.shape[0]
    hdim = w1.shape[1]
    dt = x.dtype
    weight_bytes = (inner * d + d * hdim + hdim * d) * dt.itemsize
    per_row = (4 * d + inner + hdim) * dt.itemsize + (2 * d + hdim) * 4
    block_t = _fit_block_t(block_t, weight_bytes, per_row, dt.itemsize, t, dt)
    xp = _pad_tokens(x, block_t)
    op = _pad_tokens(o, block_t)
    tp = xp.shape[0]
    row = lambda a: a.reshape(1, -1)

    kernel = functools.partial(_proj_mlp_fwd_kernel, eps=eps, gelu=gelu)
    out_specs = [
        pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((tp, d), dt),
        jax.ShapeDtypeStruct((tp, d), dt),
    ]
    if save_residuals:
        out_specs += [
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, hdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((tp, d), dt),
            jax.ShapeDtypeStruct((tp, hdim), dt),
        ]
    else:
        kernel = functools.partial(kernel, xn_ref=None, h_ref=None)

    out = pl.pallas_call(
        kernel,
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, inner), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * (inner * d + 2 * d * hdim),
            bytes_accessed=(5 * tp * d + tp * inner + tp * hdim) * dt.itemsize,
            transcendentals=tp * hdim,
        ),
        interpret=interpret,
    )(xp, op, wo, row(bo).astype(dt), row(gamma).astype(dt),
      row(beta).astype(dt), w1, row(b1).astype(dt), w2, row(b2).astype(dt))
    if save_residuals:
        z, y, xn, h = out
        return z[:t], y[:t], xn[:t], h[:t]
    return out[0][:t], None, None, None


def _proj_mlp_backward(dz, y, h, gamma, wo, w1, w2, eps, block_t, interpret,
                       gelu):
    t, d = y.shape
    inner = wo.shape[0]
    hdim = w1.shape[1]
    dt = y.dtype
    weight_bytes = (inner * d + d * hdim + hdim * d) * dt.itemsize
    per_row = (3 * d + inner + 3 * hdim) * dt.itemsize + (2 * d + hdim) * 4
    block_t = _fit_block_t(block_t, weight_bytes, per_row, dt.itemsize, t, dt)
    dzp = _pad_tokens(dz, block_t)
    yp = _pad_tokens(y, block_t)
    hp = _pad_tokens(h, block_t)
    tp = yp.shape[0]

    dy, do, dh, gact, dg, db, dbo, db1, db2 = pl.pallas_call(
        functools.partial(_proj_mlp_bwd_kernel, eps=eps, gelu=gelu),
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, hdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, inner), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, hdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, hdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, d), dt),
            jax.ShapeDtypeStruct((tp, inner), dt),
            jax.ShapeDtypeStruct((tp, hdim), dt),
            jax.ShapeDtypeStruct((tp, hdim), dt),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * (inner * d + 2 * d * hdim),
            bytes_accessed=2 * (4 * tp * d + tp * inner
                                + 2 * tp * hdim) * dt.itemsize,
            transcendentals=2 * tp * hdim,
        ),
        interpret=interpret,
    )(dzp, yp, hp, gamma.reshape(1, -1).astype(dt), wo.T, w1.T, w2.T)
    return (dy[:t], do[:t], dh[:t], gact[:t], dg.reshape(-1), db.reshape(-1),
            dbo.reshape(-1), db1.reshape(-1), db2.reshape(-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def proj_mlp(x, o, wo, bo, gamma, beta, w1, b1, w2, b2,
             eps: float = 1e-3, block_t: int = DEFAULT_BLOCK_T,
             interpret: bool = False, gelu: str = "tanh"):
    """Attention-out projection + residual + pre-norm MLP + residual as one
    pass over (tokens, ·) rows.

    x: (t, d) residual stream.  o: (t, inner) attention output (merged
    heads).  wo/bo: out projection (reference vit.py:62-69).  gamma/beta/
    w1/b1/w2/b2: the MLP block (reference vit.py:24-47).
    """
    z, _, _, _ = _proj_mlp_forward(x, o, wo, bo, gamma, beta, w1, b1, w2, b2,
                                   eps, block_t, interpret, gelu,
                                   save_residuals=False)
    return z


def _proj_mlp_vjp_fwd(x, o, wo, bo, gamma, beta, w1, b1, w2, b2,
                      eps, block_t, interpret, gelu):
    z, y, xn, h = _proj_mlp_forward(x, o, wo, bo, gamma, beta, w1, b1, w2,
                                    b2, eps, block_t, interpret, gelu)
    return z, (o, y, xn, h, gamma, wo, w1, w2)


def _proj_mlp_vjp_bwd(eps, block_t, interpret, gelu, res, dz):
    o, y, xn, h, gamma, wo, w1, w2 = res
    dy, do, dh, gact, dg, db, dbo, db1, db2 = _proj_mlp_backward(
        dz, y, h, gamma, wo, w1, w2, eps, block_t, interpret, gelu)
    # Weight gradients: near-peak XLA GEMMs over saved/re-emitted residuals.
    dwo = jax.lax.dot_general(
        o, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wo.dtype)
    dw1 = jax.lax.dot_general(
        xn, dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w1.dtype)
    dw2 = jax.lax.dot_general(
        gact, dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w2.dtype)
    return (dy, do, dwo, dbo.astype(wo.dtype), dg, db,
            dw1, db1.astype(w1.dtype), dw2, db2.astype(w2.dtype))


proj_mlp.defvjp(_proj_mlp_vjp_fwd, _proj_mlp_vjp_bwd)
