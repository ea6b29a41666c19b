"""Fused cross-attention block: ``x + out(attn(xn @ wq, k, v))`` as one
Pallas kernel pair (forward + custom VJP).

Serves the conv-hybrid "global attention" shape (reference
twins_svt.py:158-190, scalable_vit.py:104-143): queries come from a 1×1
conv (= tokenwise GEMM) of the normalized stream, but k/v come from a
*strided* conv reduction — a real convolution that cannot fold into a
tokenwise kernel.  So k/v stay precomputed XLA inputs, and the kernel
fuses everything tokenwise around the attention middle: the q projection,
per-head softmax(q·kᵀ)·v on lane-sliced heads, the output projection and
the residual add.  XLA's path for the same composition materializes
f32 (b·h, n, n_k) score maps in HBM plus 4 head split/merge reshapes and
layout copies per layer (profiled ~9 ms/step on Twins-SVT stage 1 alone —
benchmarks/profiles/twins_svt.md).

The LayerNorm is NOT inside: the caller computes ``xn`` once in XLA where
it already fuses with the k/v convolution that consumes it too.
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


def fused_cross_attention_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _batch_block(n, nk, c, hk, hv, itemsize, bwd):
    n_p = _roundup(n, 8)
    nk_lane = _roundup(nk, 128)
    weights = 2 * (c * hk + hv * c) * itemsize
    per_img = (3 * n_p * c + 2 * n_p * hk + 2 * n_p * hv
               + 2 * nk * (hk + hv)) * itemsize \
        + (4 if bwd else 2) * n_p * nk_lane * 4
    budget = 44 * 1024 * 1024 - weights
    return int(max(1, min(budget // max(per_img, 1), 16)))


# --- kernels -----------------------------------------------------------------


def _fwd_kernel(x_ref, xn_ref, wq_ref, k_ref, v_ref, wo_ref, bo_ref,
                y_ref, q_ref=None, oattn_ref=None, *,
                heads, dh_k, dh_v, scale):
    bb, n, c = x_ref.shape
    hk, hv = heads * dh_k, heads * dh_v
    x = x_ref[:]
    xn = xn_ref[:]

    q = jnp.dot(xn.reshape(bb * n, c), wq_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    q3 = q.reshape(bb, n, hk)
    if q_ref is not None:
        q_ref[:] = q3

    k3, v3 = k_ref[:], v_ref[:]
    outs = []
    for h in range(heads):
        qh = q3[:, :, h * dh_k:(h + 1) * dh_k]
        kh = k3[:, :, h * dh_k:(h + 1) * dh_k]
        vh = v3[:, :, h * dh_v:(h + 1) * dh_v]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (bb, n, nk) f32
        # Late-divide softmax: normalize AFTER the p@v dot so the divide
        # touches (bb, n, dh_v) instead of the lane-padded (bb, n, nk)
        # probability matrix (same trick as fused_attention_block —
        # measured -0.17 ms/step on B/16).
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(x.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / den
        outs.append(o.astype(x.dtype))
    oattn = jnp.concatenate(outs, axis=-1)  # (bb, n, hv)
    if oattn_ref is not None:
        oattn_ref[:] = oattn

    y = jnp.dot(oattn.reshape(bb * n, hv), wo_ref[:],
                preferred_element_type=jnp.float32) \
        + bo_ref[:].astype(jnp.float32)
    y_ref[:] = x + y.astype(x.dtype).reshape(bb, n, c)


def _bwd_kernel(dy_ref, q_ref, k_ref, v_ref, wqt_ref, wot_ref,
                dxn_ref, dq_ref, dk_ref, dv_ref, dbo_ref, *,
                heads, dh_k, dh_v, scale):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    bb, n, hk = q_ref.shape
    c = dy_ref.shape[-1]
    dt = dy_ref.dtype
    dy = dy_ref[:]
    dy2 = dy.reshape(bb * n, c)

    doattn = jnp.dot(dy2, wot_ref[:],
                     preferred_element_type=jnp.float32).astype(dt)
    hv = doattn.shape[-1]
    do3 = doattn.reshape(bb, n, hv)

    q3, k3, v3 = q_ref[:], k_ref[:], v_ref[:]
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        qh = q3[:, :, h * dh_k:(h + 1) * dh_k]
        kh = k3[:, :, h * dh_k:(h + 1) * dh_k]
        vh = v3[:, :, h * dh_v:(h + 1) * dh_v]
        do = do3[:, :, h * dh_v:(h + 1) * dh_v]

        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        p = _softmax(s)  # (bb, n, nk) f32
        pd = p.astype(dt)

        dv = jax.lax.dot_general(
            pd, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # pᵀ @ do → (bb, nk, dh_v)
        dp = jax.lax.dot_general(
            do, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (bb, n, nk)
        dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - dsum) * scale).astype(dt)
        dq = jax.lax.dot_general(
            ds, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # dsᵀ @ q → (bb, nk, dh_k)
        dqs.append(dq.astype(dt))
        dks.append(dk.astype(dt))
        dvs.append(dv.astype(dt))

    dq3 = jnp.concatenate(dqs, axis=-1)  # (bb, n, hk)
    dq_ref[:] = dq3
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)

    dxn = jnp.dot(dq3.reshape(bb * n, hk), wqt_ref[:],
                  preferred_element_type=jnp.float32)
    dxn_ref[:] = dxn.astype(dt).reshape(bb, n, c)
    dbo_ref[:] += jnp.sum(dy2.astype(jnp.float32), axis=0, keepdims=True)


# --- host wrappers -----------------------------------------------------------


def _pad_batch(a, bb):
    pad = (-a.shape[0]) % bb
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a


def _forward(x, xn, wq, k, v, wo, bo, heads, dh_k, dh_v, scale,
             interpret=False, save_residuals=True):
    b, n, c = x.shape
    nk = k.shape[1]
    hk, hv = heads * dh_k, heads * dh_v
    dt = x.dtype
    bb = min(_batch_block(n, nk, c, hk, hv, dt.itemsize, bwd=False), b)
    xp, xnp, kp, vp = (_pad_batch(a, bb) for a in (x, xn, k, v))
    bp = xp.shape[0]
    row = lambda a: a.reshape(1, -1)

    kernel = functools.partial(_fwd_kernel, heads=heads, dh_k=dh_k,
                               dh_v=dh_v, scale=scale)
    if save_residuals:
        extra_specs = [
            pl.BlockSpec((bb, n, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, hv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        extra_shapes = [jax.ShapeDtypeStruct((bp, n, hk), dt),
                        jax.ShapeDtypeStruct((bp, n, hv), dt)]
    else:
        kernel = functools.partial(kernel, q_ref=None, oattn_ref=None)
        extra_specs, extra_shapes = [], []

    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hk), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk, hv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hv, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_shape=[jax.ShapeDtypeStruct((bp, n, c), dt)] + extra_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * n * c * (hk + hv)
            + 2 * bp * heads * n * nk * (dh_k + dh_v),
            bytes_accessed=2 * bp * n * c * dt.itemsize,
            transcendentals=bp * heads * n * nk,
        ),
        interpret=interpret,
    )(xp, xnp, wq, kp, vp, wo, row(bo))
    if save_residuals:
        y, q, oattn = out
        return y[:b], q[:b], oattn[:b]
    return out[0][:b], None, None


def _backward(dy, q, k, v, wq, wo, heads, dh_k, dh_v, scale,
              interpret=False):
    b, n, hk = q.shape
    nk = k.shape[1]
    c = dy.shape[-1]
    hv = heads * dh_v
    dt = dy.dtype
    bb = min(_batch_block(n, nk, c, hk, hv, dt.itemsize, bwd=True), b)
    dyp, qp, kp, vp = (_pad_batch(a, bb) for a in (dy, q, k, v))
    bp = qp.shape[0]

    kernel = functools.partial(_bwd_kernel, heads=heads, dh_k=dh_k,
                               dh_v=dh_v, scale=scale)
    dxn, dq, dk, dv, dbo = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk, hv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hv), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nk, hv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n, c), dt),
            jax.ShapeDtypeStruct((bp, n, hk), dt),
            jax.ShapeDtypeStruct((bp, nk, hk), dt),
            jax.ShapeDtypeStruct((bp, nk, hv), dt),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * n * c * (hk + hv)
            + 6 * bp * heads * n * nk * (dh_k + dh_v),
            bytes_accessed=4 * bp * n * c * dt.itemsize,
            transcendentals=bp * heads * n * nk,
        ),
        interpret=interpret,
    )(dyp, qp, kp, vp, wq.T, wo.T)
    return dxn[:b], dq[:b], dk[:b], dv[:b], dbo.reshape(-1)


# --- public op ---------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_cross_attention_block(x, xn, wq, k, v, wo, bo,
                                heads: int, dh_k: int, dh_v: int,
                                scale: float = None,
                                interpret: bool = False):
    """``x + out_proj(attention(xn @ wq, k, v))`` over token-major tensors.

    x, xn: (b, n, c) — residual stream and its (externally computed) LN.
    wq: (c, heads·dh_k) no bias; k: (b, n_k, heads·dh_k);
    v: (b, n_k, heads·dh_v); wo: (heads·dh_v, c); bo: (c,).
    """
    if scale is None:
        scale = dh_k ** -0.5
    y, _, _ = _forward(x, xn, wq, k, v, wo, bo, heads, dh_k, dh_v, scale,
                       interpret, save_residuals=False)
    return y


def _vjp_fwd(x, xn, wq, k, v, wo, bo, heads, dh_k, dh_v, scale, interpret):
    if scale is None:
        scale = dh_k ** -0.5
    y, q, oattn = _forward(x, xn, wq, k, v, wo, bo, heads, dh_k, dh_v,
                           scale, interpret, save_residuals=True)
    return y, (xn, q, k, v, oattn, wq, wo)


def _vjp_bwd(heads, dh_k, dh_v, scale, interpret, res, dy):
    xn, q, k, v, oattn, wq, wo = res
    if scale is None:
        scale = dh_k ** -0.5
    b, n, c = xn.shape
    hk, hv = heads * dh_k, heads * dh_v
    dxn, dq, dk, dv, dbo = _backward(dy, q, k, v, wq, wo, heads, dh_k,
                                     dh_v, scale, interpret)
    # Weight grads: near-peak XLA GEMMs over saved residuals.
    dwq = jax.lax.dot_general(
        xn.reshape(b * n, c), dq.reshape(b * n, hk),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wq.dtype)
    dwo = jax.lax.dot_general(
        oattn.reshape(b * n, hv), dy.reshape(b * n, c),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wo.dtype)
    return (dy, dxn, dwq, dk, dv, dwo, dbo.astype(wo.dtype))


fused_cross_attention_block.defvjp(_vjp_fwd, _vjp_bwd)
