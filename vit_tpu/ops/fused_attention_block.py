"""Fused pre-norm attention block: ``x + out(attn(qkv(LN(x))))`` as one
Pallas kernel pair (forward + custom-VJP backward).

The reference computes this as five separate layers (reference vit.py:49-85:
LayerNorm, fused qkv Dense, einsum pair, merge, out Dense).  Under XLA that
becomes per layer: an LN-stats fusion, the qkv GEMM, a split/transpose
fusion, a scores fusion, an apply fusion, a merge transpose, the out GEMM —
with layout-churn copies of the residual stream between them (profiled:
the non-GEMM overhead is ~0.3-0.5 ms/layer on both headline workloads).

Here one program holds a micro-batch of images entirely in VMEM: LN, the
qkv projection (one GEMM over the program's tokens), per-head softmax
attention on lane-sliced q/k/v (lane slicing measured cheaper than
pre-split head tensors on v5e), head merge, the output projection and the
residual add.  The backward kernel recomputes LN and the (tiny) softmax
on-chip, fuses all attention gradients, both dgrad GEMMs and the LN
backward, and accumulates dgamma/dbeta/dbo across the sequential grid;
the two weight gradients remain near-peak XLA GEMMs over saved residuals.

Dispatch (via ``vit_tpu.layers.common.Transformer``): 16-bit models with
inactive dropout; f32 models keep the exact XLA path the parity suite pins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_VMEM_LIMIT = 100 * 1024 * 1024


def fused_attention_block_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _ln(x32, gamma32, beta32, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * rstd * gamma32 + beta32


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _batch_per_program(n: int, dmodel: int, inner: int, itemsize: int,
                       bwd: bool, b: int | None = None) -> int:
    """Images per program such that blocks + weights + temps fit VMEM.

    Prefers a VMEM-fitting bb that DIVIDES the actual batch: a dividing
    block removes the explicit pad/slice ops around the kernel (measured
    ~1.2 ms/step of pad/reshape/slice at B/16 inference, where the cap of
    9 padded batch 64 → 72).

    Short windows (n < 128, e.g. 49-token local-attention windows folded
    into the batch dim) raise the cap: per-window work is tiny, and the
    batch axis there counts thousands of window×image groups.  The window
    cap is 32, not more: Mosaic unrolls the per-head batched attention
    dots bb times, so compile cost/memory grows ~linearly with bb while
    runtime is flat (measured at the (4096, 56, 64) regionvit shape:
    bb=32 4.87 ms vs bb=128 5.00 ms fwd+bwd device time; the remote
    compile helper is OOM-killed on multi-kernel modules at bb=128)."""
    n_p = _roundup(n, 16)
    n_lane = _roundup(n, 128)
    weights = 2 * (dmodel * 3 * inner + inner * dmodel) * itemsize  # +transposed
    per_img = (4 * n_p * dmodel + 2 * 4 * n_p * inner) * itemsize \
        + (6 if bwd else 2) * n_p * n_lane * 4
    budget = 48 * 1024 * 1024 - weights
    bb = max(1, budget // max(per_img, 1))
    bb = int(min(bb, 32 if n < 128 else 16))
    if b is not None and b > bb:
        for cand in range(bb, 0, -1):
            if b % cand == 0:
                # Don't trade a tiny grid block for padding: a divisor at
                # least half the cap keeps per-program GEMMs fed.
                if cand >= max(1, bb // 2):
                    return cand
                break
    return bb


# --- forward -------------------------------------------------------------------

def _fwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, wo_ref, bo_ref,
                y_ref, xn_ref=None, qkv_ref=None, oattn_ref=None, *,
                heads, dim_head, scale, eps, bias_ref=None, n_valid=None):
    bb, n, dmodel = x_ref.shape
    inner = heads * dim_head
    x = x_ref[:]
    x32 = x.astype(jnp.float32).reshape(bb * n, dmodel)
    xn = _ln(x32, g_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32),
             eps).astype(x.dtype)
    if xn_ref is not None:
        xn_ref[:] = xn.reshape(bb, n, dmodel)

    qkv = jnp.dot(xn, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    if qkv_ref is not None:
        qkv_ref[:] = qkv.reshape(bb, n, 3 * inner)
    qkv3 = qkv.reshape(bb, n, 3 * inner)

    outs = []
    for h in range(heads):
        off = h * dim_head
        q = qkv3[:, :, off:off + dim_head]
        k = qkv3[:, :, inner + off:inner + off + dim_head]
        v = qkv3[:, :, 2 * inner + off:2 * inner + off + dim_head]
        # Input-dtype dots with f32 ACCUMULATION — explicit f32 operand
        # casts force f32-rate MXU matmuls; the scale folds into the f32
        # logits instead (measured on the short-seq kernels: ~6% of the
        # whole kernel at B/32-class shapes, more where dots dominate).
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (bb, n, n) f32
        if bias_ref is not None:
            hb = h if bias_ref.shape[0] > 1 else 0
            s = s + bias_ref[hb][None].astype(jnp.float32)
        if n_valid is not None and n_valid < n:
            # Token axis host-padded to a sublane multiple (Mosaic can't
            # shape-cast (bb, n, d<128-lane) flattens at odd n): mask the
            # pad keys out of every softmax row.
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < n_valid, s, -1e30)
        # Late-divide softmax: normalize AFTER the p@v dot — the divide
        # then touches (bb, n, dh) instead of the lane-padded (bb, n, n)
        # probability matrix (dh=64 vs n_lane=256 at B/16: 4x less VPU
        # divide work, identical math up to rounding).
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append((o / denom).astype(x.dtype))
    oattn = jnp.concatenate(outs, axis=-1)  # (bb, n, inner)
    if oattn_ref is not None:
        oattn_ref[:] = oattn

    y = jnp.dot(oattn.reshape(bb * n, inner), wo_ref[:],
                preferred_element_type=jnp.float32) \
        + bo_ref[:].astype(jnp.float32)
    y_ref[:] = x + y.astype(x.dtype).reshape(bb, n, dmodel)


# --- backward ------------------------------------------------------------------

def _bwd_kernel(dy_ref, x_ref, qkv_ref, g_ref, wqkvt_ref, wot_ref,
                dx_ref, dqkv_ref, dg_ref, db_ref, dbo_ref, *,
                heads, dim_head, scale, eps, bias_ref=None, dbias_ref=None,
                n_valid=None):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        if dbias_ref is not None:
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

    bb, n, dmodel = x_ref.shape
    inner = heads * dim_head
    dy = dy_ref[:]
    dy2 = dy.reshape(bb * n, dmodel)

    # dgrad through the out projection
    doattn = jnp.dot(dy2, wot_ref[:],
                     preferred_element_type=jnp.float32).astype(dy.dtype)
    do3 = doattn.reshape(bb, n, inner)

    qkv3 = qkv_ref[:]
    dqs, dks, dvs = [], [], []
    dt = dy.dtype
    for h in range(heads):
        off = h * dim_head
        # Input-dtype dots, f32 accumulation (see _fwd_kernel); the f32
        # probability/score intermediates round to dt only where they feed
        # an MXU operand.
        q = qkv3[:, :, off:off + dim_head]
        k = qkv3[:, :, inner + off:inner + off + dim_head]
        v = qkv3[:, :, 2 * inner + off:2 * inner + off + dim_head]
        do = do3[:, :, off:off + dim_head]

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            hb = h if bias_ref.shape[0] > 1 else 0
            s = s + bias_ref[hb][None].astype(jnp.float32)
        if n_valid is not None and n_valid < n:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < n_valid, s, -1e30)
        p = _softmax(s)  # (bb, n, n) f32
        pd = p.astype(dt)

        dv = jax.lax.dot_general(
            pd, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # p^T @ do
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds0 = p * (dp - dsum)  # (bb, n, n) f32: d(loss)/d(logits)
        if dbias_ref is not None:
            hb = h if dbias_ref.shape[0] > 1 else 0
            dbias_ref[hb] += jnp.sum(ds0, axis=0)
        ds = (ds0 * scale).astype(dt)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # ds^T @ q
        dqs.append(dq.astype(dt)); dks.append(dk.astype(dt)); dvs.append(dv.astype(dt))

    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (bb, n, 3·inner)
    dqkv_ref[:] = dqkv

    # dgrad through the qkv projection, then LayerNorm backward
    dxn = jnp.dot(dqkv.reshape(bb * n, 3 * inner), wqkvt_ref[:],
                  preferred_element_type=jnp.float32)  # (bb·n, dmodel)

    x32 = x_ref[:].astype(jnp.float32).reshape(bb * n, dmodel)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * rstd
    dxhat = dxn * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = dy + dx_ln.astype(dy.dtype).reshape(bb, n, dmodel)

    dg_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
    dbo_ref[:] += jnp.sum(dy2.astype(jnp.float32), axis=0, keepdims=True)


# --- host-side wrappers ----------------------------------------------------------

def _pad_batch(x, bb):
    b = x.shape[0]
    pad = (-b) % bb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _needs_token_pad(n: int, dmodel: int, inner: int) -> bool:
    """Mosaic can shape-cast the in-kernel (bb, n, d) ↔ (bb·n, d) flattens
    only when n is a sublane multiple OR every flattened minor dim is a
    lane multiple (measured probe matrix: 56/64 OK, 48/64 OK, 49/768 OK,
    49/64 FAILS).  Odd-n windows (e.g. 7×7=49 local attention) with narrow
    dims pad the token axis to 8 and mask the pad keys in the softmax."""
    if n % 8 == 0:
        return False
    return not (dmodel % 128 == 0 and inner % 128 == 0)


def _pad_tokens(a, n_to):
    pad = n_to - a.shape[1]
    if a.ndim == 3 and pad:
        return jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
    return a


def _forward(x, gamma, beta, wqkv, wo, bo, heads, dim_head, scale, eps,
             interpret=False, save_residuals=True, bias=None):
    b, n, dmodel = x.shape
    inner = heads * dim_head
    dt = x.dtype
    n_valid = None
    if _needs_token_pad(n, dmodel, inner):
        n_valid, n = n, _roundup(n, 8)
        x = _pad_tokens(x, n)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, n - n_valid),
                                  (0, n - n_valid)))
    bb = min(_batch_per_program(n, dmodel, inner, dt.itemsize, bwd=False, b=b), b)
    xp = _pad_batch(x, bb)
    bp = xp.shape[0]
    row = lambda a: a.reshape(1, -1)

    if bias is None:
        kernel = functools.partial(
            _fwd_kernel, heads=heads, dim_head=dim_head, scale=scale,
            eps=eps, n_valid=n_valid)
    else:
        hb = bias.shape[0]

        def kernel(x_ref, g_ref, b_ref, wqkv_ref, wo_ref, bo_ref, bias_ref,
                   y_ref, xn_ref=None, qkv_ref=None, oattn_ref=None):
            _fwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, wo_ref, bo_ref,
                        y_ref, xn_ref, qkv_ref, oattn_ref, heads=heads,
                        dim_head=dim_head, scale=scale, eps=eps,
                        bias_ref=bias_ref, n_valid=n_valid)
    if save_residuals:
        extra_specs = [
            pl.BlockSpec((bb, n, dmodel), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, 3 * inner), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, inner), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        extra_shapes = [
            jax.ShapeDtypeStruct((bp, n, dmodel), dt),
            jax.ShapeDtypeStruct((bp, n, 3 * inner), dt),
            jax.ShapeDtypeStruct((bp, n, inner), dt),
        ]
    else:
        kernel = functools.partial(kernel, xn_ref=None, qkv_ref=None,
                                   oattn_ref=None)
        extra_specs, extra_shapes = [], []

    in_specs = [
        pl.BlockSpec((bb, n, dmodel), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dmodel, 3 * inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((inner, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xp, row(gamma).astype(dt), row(beta).astype(dt), wqkv, wo,
                row(bo)]
    if bias is not None:
        in_specs.append(pl.BlockSpec((hb, n, n), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias.astype(jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bb, n, dmodel), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_shape=[jax.ShapeDtypeStruct((bp, n, dmodel), dt)] + extra_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * n * dmodel * 4 * inner + 4 * bp * heads * n * n * dim_head,
            bytes_accessed=2 * bp * n * dmodel * dt.itemsize,
            transcendentals=bp * heads * n * n,
        ),
        interpret=interpret,
    )(*operands)
    nv = n_valid or n
    if save_residuals:
        y, xn, qkv, oattn = out
        return (y[:b, :nv], xn[:b, :nv], qkv[:b, :nv], oattn[:b, :nv])
    return out[0][:b, :nv], None, None, None


def _backward(dy, x, qkv, gamma, wqkv, wo, heads, dim_head, scale, eps,
              interpret=False, bias=None):
    b, n, dmodel = x.shape
    inner = heads * dim_head
    dt = x.dtype
    n_valid = None
    if _needs_token_pad(n, dmodel, inner):
        n_valid, n = n, _roundup(n, 8)
        dy, x, qkv = (_pad_tokens(a, n) for a in (dy, x, qkv))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, n - n_valid),
                                  (0, n - n_valid)))
    bb = min(_batch_per_program(n, dmodel, inner, dt.itemsize, bwd=True, b=b), b)
    dyp, xp, qkvp = _pad_batch(dy, bb), _pad_batch(x, bb), _pad_batch(qkv, bb)
    bp = xp.shape[0]
    wqkvt = wqkv.T  # (3·inner, dmodel)
    wot = wo.T      # (dmodel, inner)

    if bias is None:
        kernel = functools.partial(
            _bwd_kernel, heads=heads, dim_head=dim_head, scale=scale,
            eps=eps, n_valid=n_valid)
    else:
        hb = bias.shape[0]

        def kernel(dy_ref, x_ref, qkv_ref, g_ref, wqkvt_ref, wot_ref,
                   bias_ref, dx_ref, dqkv_ref, dg_ref, db_ref, dbo_ref,
                   dbias_ref):
            _bwd_kernel(dy_ref, x_ref, qkv_ref, g_ref, wqkvt_ref, wot_ref,
                        dx_ref, dqkv_ref, dg_ref, db_ref, dbo_ref,
                        heads=heads, dim_head=dim_head, scale=scale, eps=eps,
                        bias_ref=bias_ref, dbias_ref=dbias_ref,
                        n_valid=n_valid)

    in_specs = [
        pl.BlockSpec((bb, n, dmodel), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, n, dmodel), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, n, 3 * inner), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * inner, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dmodel, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [dyp, xp, qkvp, gamma.reshape(1, -1).astype(dt), wqkvt, wot]
    out_specs = [
        pl.BlockSpec((bb, n, dmodel), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, n, 3 * inner), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dmodel), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bp, n, dmodel), dt),
        jax.ShapeDtypeStruct((bp, n, 3 * inner), dt),
        jax.ShapeDtypeStruct((1, dmodel), jnp.float32),
        jax.ShapeDtypeStruct((1, dmodel), jnp.float32),
        jax.ShapeDtypeStruct((1, dmodel), jnp.float32),
    ]
    if bias is not None:
        in_specs.append(pl.BlockSpec((hb, n, n), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias.astype(jnp.float32))
        out_specs.append(pl.BlockSpec((hb, n, n), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((hb, n, n), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * n * dmodel * 4 * inner + 10 * bp * heads * n * n * dim_head,
            bytes_accessed=4 * bp * n * dmodel * dt.itemsize,
            transcendentals=bp * heads * n * n,
        ),
        interpret=interpret,
    )(*operands)
    dx, dqkv, dg, db, dbo = outs[:5]
    dbias = outs[5] if bias is not None else None
    nv = n_valid or n
    if dbias is not None:
        dbias = dbias[:, :nv, :nv]
    return (dx[:b, :nv], dqkv[:b, :nv], dg.reshape(-1), db.reshape(-1),
            dbo.reshape(-1), dbias)


# --- public op -------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_attention_block(x, gamma, beta, wqkv, wo, bo,
                          heads: int, dim_head: int, scale: float = None,
                          eps: float = 1e-3, interpret: bool = False):
    """``x + out_proj(multi_head_attention(LN(x)·γβ @ wqkv)) `` over (b, n, d).

    wqkv: (d, 3·heads·dim_head) with q|k|v thirds (no bias — reference
    vit.py:63 to_qkv).  wo: (heads·dim_head, d), bo: (d,).
    """
    if scale is None:
        scale = dim_head ** -0.5
    y, _, _, _ = _forward(x, gamma, beta, wqkv, wo, bo, heads, dim_head,
                          scale, eps, interpret, save_residuals=False)
    return y


def _vjp_fwd(x, gamma, beta, wqkv, wo, bo, heads, dim_head, scale, eps,
             interpret):
    if scale is None:
        scale = dim_head ** -0.5
    y, xn, qkv, oattn = _forward(x, gamma, beta, wqkv, wo, bo, heads,
                                 dim_head, scale, eps, interpret,
                                 save_residuals=True)
    return y, (x, xn, qkv, oattn, gamma, wqkv, wo)


def _vjp_bwd(heads, dim_head, scale, eps, interpret, res, dy):
    x, xn, qkv, oattn, gamma, wqkv, wo = res
    if scale is None:
        scale = dim_head ** -0.5
    b, n, dmodel = x.shape
    inner = heads * dim_head
    dx, dqkv, dg, db, dbo, _ = _backward(dy, x, qkv, gamma, wqkv, wo, heads,
                                         dim_head, scale, eps, interpret)
    # Weight gradients: near-peak XLA GEMMs over the saved residuals.
    dwqkv = jax.lax.dot_general(
        xn.reshape(b * n, dmodel), dqkv.reshape(b * n, 3 * inner),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wqkv.dtype)
    dwo = jax.lax.dot_general(
        oattn.reshape(b * n, inner), dy.reshape(b * n, dmodel),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wo.dtype)
    return (dx, dg, db, dwqkv, dwo, dbo.astype(wo.dtype))


fused_attention_block.defvjp(_vjp_fwd, _vjp_bwd)


# --- biased variant ---------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_attention_block_bias(x, gamma, beta, wqkv, wo, bo, bias,
                               heads: int, dim_head: int, scale: float = None,
                               eps: float = 1e-3, interpret: bool = False):
    """:func:`fused_attention_block` plus an additive attention bias.

    ``bias`` is ``(1, n, n)`` (shared across heads — CrossFormer's dynamic
    position bias, reference crossformer.py:148-170) or ``(heads, n, n)``
    (per-head — RegionViT's relative position table, regionvit.py:118-149),
    f32, added to the scaled logits before softmax.  Gradients flow to
    ``bias`` (the reference's DPB gradient is severed by its ``.numpy()``
    escape — SURVEY.md §8.5; here the producing MLP/Embed trains).
    """
    if scale is None:
        scale = dim_head ** -0.5
    y, _, _, _ = _forward(x, gamma, beta, wqkv, wo, bo, heads, dim_head,
                          scale, eps, interpret, save_residuals=False,
                          bias=bias)
    return y


def _vjp_fwd_bias(x, gamma, beta, wqkv, wo, bo, bias, heads, dim_head, scale,
                  eps, interpret):
    if scale is None:
        scale = dim_head ** -0.5
    y, xn, qkv, oattn = _forward(x, gamma, beta, wqkv, wo, bo, heads,
                                 dim_head, scale, eps, interpret,
                                 save_residuals=True, bias=bias)
    return y, (x, xn, qkv, oattn, gamma, wqkv, wo, bias)


def _vjp_bwd_bias(heads, dim_head, scale, eps, interpret, res, dy):
    x, xn, qkv, oattn, gamma, wqkv, wo, bias = res
    if scale is None:
        scale = dim_head ** -0.5
    b, n, dmodel = x.shape
    inner = heads * dim_head
    dx, dqkv, dg, db, dbo, dbias = _backward(dy, x, qkv, gamma, wqkv, wo,
                                             heads, dim_head, scale, eps,
                                             interpret, bias=bias)
    dwqkv = jax.lax.dot_general(
        xn.reshape(b * n, dmodel), dqkv.reshape(b * n, 3 * inner),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wqkv.dtype)
    dwo = jax.lax.dot_general(
        oattn.reshape(b * n, inner), dy.reshape(b * n, dmodel),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wo.dtype)
    return (dx, dg, db, dwqkv, dwo, dbo.astype(wo.dtype),
            dbias.astype(bias.dtype))


fused_attention_block_bias.defvjp(_vjp_fwd_bias, _vjp_bwd_bias)
