"""Blockwise flash-attention backward (Pallas) — the long-context training
path.

Round 1's flash kernels routed their VJP through a materialized XLA
attention (O(n²) HBM at exactly the lengths the kernels exist for).  Here
the backward is the standard two-pass streaming decomposition with O(n)
residuals:

* forward saves the per-row logsumexp ``lse`` (no n² state);
* ``D = rowsum(dO ∘ O)`` is a cheap elementwise XLA reduction;
* pass 1 streams K/V blocks to accumulate dQ;
* pass 2 streams Q/dO blocks to accumulate dK and dV.

Both passes rebuild each score tile as ``p = exp(s − lse)`` — one tile at a
time in VMEM, never in HBM.  Used by both flash kernels
(``flash_attention`` v1 and ``flash_attention_v2``), so long-context
*training* gets the O(n) memory the forward already had.
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
_VMEM_LIMIT = 64 * 1024 * 1024
_NEG_INF = -jnp.finfo(jnp.float32).max


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, dq_ref, *,
               scale, n_k, block_k):
    """grid (bh, q_blocks, k_blocks) — k innermost, dQ accumulated."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]          # (block_q, 1) f32
    dcap = dcap_ref[0]        # (block_q, 1) f32 — rowsum(dO ∘ O)

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (block_q, block_k)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < n_k, s, _NEG_INF)
    p = jnp.exp(s - lse)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dcap) * scale
    dq_ref[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref,
                dk_ref, dv_ref, *, scale, n_k, block_k):
    """grid (bh, k_blocks, q_blocks) — q innermost, dK/dV accumulated."""
    qb = pl.program_id(2)
    kb = pl.program_id(1)

    @pl.when(qb == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    dcap = dcap_ref[0]

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (block_q, block_k)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < n_k, s, _NEG_INF)
    p = jnp.exp(s - lse)

    dv_ref[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]  # p^T @ do → (block_k, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dcap) * scale
    dk_ref[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]  # ds^T @ q → (block_k, d)


def _pad_seq(x, block):
    pad = (-x.shape[1]) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


def _pad_rows(x, block):
    pad = (-x.shape[1]) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def flash_backward(q, k, v, o, lse, do, scale, block_q=BLOCK_Q,
                   block_k=BLOCK_K, interpret=False):
    """dQ, dK, dV for softmax(q·kᵀ·scale)·v given O(n) residuals.

    q, do, o: (b, h, n_q, d); k, v: (b, h, n_k, d); lse: (b, h, n_q) f32.
    """
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    dt = q.dtype
    block_q = min(block_q, max(16, n_q))
    block_k = min(block_k, -(-n_k // 128) * 128)

    # D = rowsum(dO ∘ O) — cheap elementwise XLA reduce, O(n) memory.
    dcap = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    def flat(x, block):
        return _pad_seq(x.reshape(b * h, x.shape[2], d), block)

    qf, dof = flat(q, block_q), flat(do, block_q)
    kf, vf = flat(k, block_k), flat(v, block_k)
    lsef = _pad_rows(lse.reshape(b * h, n_q), block_q)[..., None]
    dcapf = _pad_rows(dcap.reshape(b * h, n_q), block_q)[..., None]
    bh, n_qp = qf.shape[0], qf.shape[1]
    n_kp = kf.shape[1]

    q_spec = pl.BlockSpec((1, block_q, d), lambda i, j, kb: (i, j, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d), lambda i, j, kb: (i, kb, 0),
                          memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((1, block_q, 1), lambda i, j, kb: (i, j, 0),
                          memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_k=n_k, block_k=block_k),
        grid=(bh, n_qp // block_q, n_kp // block_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, r_spec, r_spec],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kb: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_qp, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * n_qp * n_kp * d,
            bytes_accessed=(2 * qf.size + 2 * kf.size) * dt.itemsize,
            transcendentals=bh * n_qp * n_kp,
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, dcapf)

    # pass 2: swap the roles — k blocks outer, q blocks inner (accumulated)
    q_spec2 = pl.BlockSpec((1, block_q, d), lambda i, kb, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    k_spec2 = pl.BlockSpec((1, block_k, d), lambda i, kb, j: (i, kb, 0),
                           memory_space=pltpu.VMEM)
    r_spec2 = pl.BlockSpec((1, block_q, 1), lambda i, kb, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    kv_out_spec = pl.BlockSpec((1, block_k, d), lambda i, kb, j: (i, kb, 0),
                               memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, n_k=n_k, block_k=block_k),
        grid=(bh, n_kp // block_k, n_qp // block_q),
        in_specs=[q_spec2, k_spec2, k_spec2, q_spec2, r_spec2, r_spec2],
        out_specs=[kv_out_spec, kv_out_spec],
        out_shape=[jax.ShapeDtypeStruct((bh, n_kp, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, n_kp, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * n_qp * n_kp * d,
            bytes_accessed=(2 * qf.size + 3 * kf.size) * dt.itemsize,
            transcendentals=bh * n_qp * n_kp,
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, dcapf)

    dq = dq[:, :n_q].reshape(b, h, n_q, d).astype(dt)
    dk = dk[:, :n_k].reshape(b, h, n_k, d).astype(dt)
    dv = dv[:, :n_k].reshape(b, h, n_k, d).astype(dt)
    return dq, dk, dv
