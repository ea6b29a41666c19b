"""Blockwise (flash) attention Pallas kernel for TPU.

Replaces the reference's materialized ``einsum('bhid,bhjd->bhij')`` +
softmax + ``einsum('bhij,bhjd->bhid')`` pair (reference vit.py:77-81) with an
online-softmax kernel: O(n) memory, f32 accumulation, K/V streamed through
VMEM in lane-aligned blocks.  The blockwise recurrence is the hook that makes
a future ring-attention decomposition over an ``sp`` mesh axis a kernel-loop
change rather than a redesign (SURVEY.md §5 long-context).

Sequences are padded to the K-block size inside the wrapper; padded key
positions are masked with -f32.max before the softmax, padded query rows are
sliced off on return.

The backward is the streaming Pallas decomposition in
``vit_tpu.ops.flash_backward`` (O(n) residuals: the forward saves the
per-row logsumexp; score tiles are rebuilt in VMEM, never in HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable jaxlib; degrade gracefully elsewhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# Tuned on v5e (see benchmarks): big K blocks win — one full-K pass when it
# fits VMEM (block_q×block_k f32 scores ≤ 4MB), online recurrence beyond.
BLOCK_Q = 256
BLOCK_K = 4096

_NEG_INF = -jnp.finfo(jnp.float32).max


def flash_attention_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                  n_k: int, block_k: int):
    """One (batch·head, q-block) program: stream K/V blocks with online softmax.

    q_ref: (1, block_q, d); k_ref/v_ref: (1, n_k_padded, d); o_ref like q_ref.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    n_k_padded = k_ref.shape[1]
    num_kb = n_k_padded // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        # Mask padded key positions.
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        s = jnp.where(col < n_k, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # O(n) softmax residual for the streaming backward (flash_backward.py)
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _pad_seq(x, block):
    n = x.shape[2]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale=None):
    out, _ = _flash_forward(q, k, v, scale)
    return out


def _flash_forward(q, k, v, scale, block_q=None, block_k=None):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n_q, d = q.shape
    n_k = k.shape[2]

    block_q = block_q or min(BLOCK_Q, max(8, n_q))
    block_k = block_k or min(BLOCK_K, -(-n_k // 128) * 128)
    assert n_k <= 4096, (
        "flash_attention currently keeps full K/V VMEM-resident per program "
        f"(n_k={n_k} > 4096 exhausts VMEM) — use the XLA attention path, or "
        "stream K/V blocks (planned)"
    )

    qp = _pad_seq(q, block_q)
    kp = _pad_seq(k, block_k)
    vp = _pad_seq(v, block_k)
    n_qp, n_kp = qp.shape[2], kp.shape[2]

    qf = qp.reshape(b * h, n_qp, d)
    kf = kp.reshape(b * h, n_kp, d)
    vf = vp.reshape(b * h, n_kp, d)

    grid = (b * h, n_qp // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_k=n_k, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_qp, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_qp, 1), jnp.float32),
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


def _fwd(q, k, v, scale):
    out, lse = _flash_forward(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _bwd(scale, res, g):
    from vit_tpu.ops.flash_backward import flash_backward

    q, k, v, out, lse = res
    s = q.shape[-1] ** -0.5 if scale is None else scale
    return flash_backward(q, k, v, out, lse, g, s)


flash_attention.defvjp(_fwd, _bwd)
