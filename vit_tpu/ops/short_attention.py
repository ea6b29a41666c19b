"""Fused short-sequence multi-head attention (Pallas, fwd + custom VJP).

Every model in this zoo runs attention at n ≤ 257 tokens (SURVEY.md §5) —
three orders of magnitude below the flash-attention regime.  At these
lengths the cost is not FLOPs but the n² score matrix making HBM round
trips between XLA's score, softmax and apply fusions, plus layout-churn
copies around the (b, h, n, d) transposes (profiled: ~55% of a B/16
forward; replaces the reference's einsum pair, reference vit.py:77-81).

Here whole (head-batch, n, d) tiles stay VMEM-resident: one program
computes scores, a f32 softmax and the value contraction for ``g``
batch·head slices; the backward recomputes the (tiny) softmax on-chip and
fuses all five attention gradients.  O(n²) never touches HBM.

Status: explicit-use only.  Measured on v5e, XLA's own attention keeps the
n² matrix in VMEM at these sizes and wins standalone (0.18 vs 0.50 ms at
b64·h12·n197·d64), so ``vit_tpu.ops.attention`` never auto-dispatches here;
the in-model win came from fusing the *whole block* instead
(``vit_tpu.ops.fused_attention_block``).  Kept as a building block — its
(head-batch, n, d) tiling is the shape a masked/biased windowed-attention
kernel would extend.
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

MAX_SEQ = 512  # above this the flash kernels / XLA take over


def short_attention_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


_VMEM_LIMIT = 64 * 1024 * 1024  # v5e has 128M physical; leave headroom


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _heads_per_program(n_q: int, n_k: int, d: int, itemsize: int,
                       bwd: bool) -> int:
    """Pick g so per-program blocks + f32 temporaries fit VMEM.

    Counts *padded* tile sizes (lanes round to 128, sublanes to 8/16) and
    the ×2 block double-buffering Mosaic applies — the naive logical sizes
    under-count by ~4× at d=64.
    """
    sub = 16 if itemsize == 2 else 8
    nq_p, nk_p = _roundup(n_q, sub), _roundup(n_k, sub)
    nk_lane = _roundup(n_k, 128)
    d_p = _roundup(d, 128)
    if bwd:
        io = (3 * nq_p + 4 * nk_p) * d_p * itemsize  # q,do,dq + k,v,dk,dv
        temps = 5 * _roundup(n_q, 8) * nk_lane * 4   # p, dp, ds + slack
    else:
        io = (2 * nq_p + 2 * nk_p) * d_p * itemsize  # q,o + k,v
        temps = 3 * _roundup(n_q, 8) * nk_lane * 4   # s, p + slack
    per_g = 2 * io + temps                           # ×2: double buffering
    budget = _VMEM_LIMIT // 2
    g = max(1, budget // max(per_g, 1))
    return int(min(g, 64))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, n_q, n_k)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, n_q, d)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)

    s = jax.lax.dot_general(
        q * scale, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (g, n_q, n_k)

    dv = jax.lax.dot_general(
        p, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, n_k, d) = p^T @ do
    dp = jax.lax.dot_general(
        do, v_ref[:].astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, n_q, n_k)
    dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - dsum) * scale

    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, n_q, d)
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, n_k, d) = ds^T @ q

    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _pad_heads(x, g):
    bh = x.shape[0]
    pad = (-bh) % g
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    return x


def _forward(q, k, v, scale, interpret=False):
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    dt = q.dtype
    qf = q.reshape(b * h, n_q, d)
    kf = k.reshape(b * h, n_k, d)
    vf = v.reshape(b * h, n_k, d)
    g = _heads_per_program(n_q, n_k, d, dt.itemsize, bwd=False)
    g = min(g, b * h)
    qf, kf, vf = _pad_heads(qf, g), _pad_heads(kf, g), _pad_heads(vf, g)
    bh = qf.shape[0]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, n_q, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, n_q, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_q * n_k * d,
            bytes_accessed=(2 * bh * n_q * d + 2 * bh * n_k * d) * dt.itemsize,
            transcendentals=bh * n_q * n_k,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[: b * h].reshape(b, h, n_q, d)


def _backward(q, k, v, do, scale, interpret=False):
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    dt = q.dtype
    qf = q.reshape(b * h, n_q, d)
    kf = k.reshape(b * h, n_k, d)
    vf = v.reshape(b * h, n_k, d)
    dof = do.reshape(b * h, n_q, d)
    g = _heads_per_program(n_q, n_k, d, dt.itemsize, bwd=True)
    g = min(g, b * h)
    qf, kf, vf, dof = (_pad_heads(a, g) for a in (qf, kf, vf, dof))
    bh = qf.shape[0]

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, n_q, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_q, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, n_q, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_q, d), dt),
            jax.ShapeDtypeStruct((bh, n_k, d), dt),
            jax.ShapeDtypeStruct((bh, n_k, d), dt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n_q * n_k * d,
            bytes_accessed=(5 * bh * n_q * d + 4 * bh * n_k * d) * dt.itemsize,
            transcendentals=bh * n_q * n_k,
        ),
        interpret=interpret,
    )(qf, kf, vf, dof)
    m = b * h
    return (dq[:m].reshape(b, h, n_q, d), dk[:m].reshape(b, h, n_k, d),
            dv[:m].reshape(b, h, n_k, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def short_attention(q, k, v, scale=None, interpret=False):
    """Fused softmax(q·kᵀ·scale)·v over (b, h, n, d), n ≤ MAX_SEQ."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _forward(q, k, v, scale, interpret)


def _vjp_fwd(q, k, v, scale, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _forward(q, k, v, scale, interpret), (q, k, v)


def _vjp_bwd(scale, interpret, res, do):
    q, k, v = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _backward(q, k, v, do, scale, interpret)


short_attention.defvjp(_vjp_fwd, _vjp_bwd)
