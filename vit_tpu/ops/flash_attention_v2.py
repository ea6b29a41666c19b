"""Flash attention v2 — K/V streamed per grid step (no whole-K residency).

The v1 kernel (``flash_attention.py``) keeps full K/V in VMEM per program,
which is fastest for n ≤ 4096 on v5e but exhausts VMEM beyond.  Here the
grid is (batch·heads, q_blocks, k_blocks) with the K axis innermost: Pallas
streams one K/V block per step while online-softmax state (m, l, acc) lives
in VMEM scratch that persists across the K steps of a given q block.
Unbounded sequence length; memory O(block_q · d).

Dispatched above n_k = 4096 (``vit_tpu.ops.attention``); v1 wins in its
whole-K-resident range.  The backward is the streaming Pallas
decomposition in ``vit_tpu.ops.flash_backward`` (O(n) residuals).  This is
also the shape a ring-attention ``sp`` decomposition would reuse
(SURVEY.md §5).
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

BLOCK_Q = 256
BLOCK_K = 512

_NEG_INF = -jnp.finfo(jnp.float32).max


def _kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *,
            scale: float, n_k: int, block_k: int):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < n_k, s, _NEG_INF)

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)
        # O(n) softmax residual for the streaming backward
        lse_ref[0] = m_ref[:] + jnp.log(jnp.maximum(l_ref[:], 1e-30))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_v2(q, k, v, scale=None, block_q=BLOCK_Q, block_k=BLOCK_K):
    out, _ = _forward(q, k, v, scale, block_q, block_k)
    return out


def _fwd(q, k, v, scale, block_q, block_k):
    out, lse = _forward(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _bwd(scale, block_q, block_k, res, g):
    from vit_tpu.ops.flash_backward import flash_backward

    q, k, v, out, lse = res
    s = q.shape[-1] ** -0.5 if scale is None else scale
    return flash_backward(q, k, v, out, lse, g, s, block_q, block_k)


def _forward(q, k, v, scale=None, block_q=BLOCK_Q, block_k=BLOCK_K):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n_q, d = q.shape
    n_k = k.shape[2]

    block_q = min(block_q, max(8, n_q))

    def pad(x, block):
        p = (-x.shape[2]) % block
        return jnp.pad(x, ((0, 0), (0, 0), (0, p), (0, 0))) if p else x

    qp, kp, vp = pad(q, block_q), pad(k, block_k), pad(v, block_k)
    n_qp, n_kp = qp.shape[2], kp.shape[2]
    qf = qp.reshape(b * h, n_qp, d)
    kf = kp.reshape(b * h, n_kp, d)
    vf = vp.reshape(b * h, n_kp, d)

    grid = (b * h, n_qp // block_q, n_kp // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_k=n_k, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_qp, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_qp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_qp * n_kp * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * n_qp * n_kp,
        ),
    )(qf, kf, vf)

    out = out.reshape(b, h, n_qp, d)[:, :, :n_q, :]
    lse = lse.reshape(b, h, n_qp)[:, :, :n_q]
    return out, lse


flash_attention_v2.defvjp(_fwd, _bwd)
