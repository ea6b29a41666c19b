"""Flash attention over the NHWC channel-packed ``(b, n, heads*d)`` layout.

ScalableViT's IWSA produces q/k/v with 1×1 convs, so they arrive
channel-packed: ``(b, H, W, heads*d)``.  Routing them through the
``(b, h, n, d)`` flash kernel costs a head-split transpose on the way in
and a head-merge transpose on the way out — ~2.5 ms/step of pure layout
copies at the stage-1 whole-map shape (profiles/scalable_vit.md:66-68).

This variant reads the packed layout directly: the grid stays
``(b, n_q_blocks)`` and the head loop is unrolled *inside* the kernel with
static lane slices (head dims here are 32, and MXU contraction cycles do
not shrink below the 128 fill, so per-head d=32 dots cost the same as the
d=64 padded ones — measured in benchmarks/exp_scalable_iwsa.py).  K/V stay
whole-sequence VMEM-resident like flash v1; output is written back packed,
so the NHWC epilogue (local-conv add, 1×1 out-projection) fuses with no
relayout.  q/k share a per-head width, v may differ (IWSA's
dim_key/dim_value split).

The backward reshapes to the head-major layout and reuses the streaming
``flash_backward`` kernel: autodiff of the rearranges in the old path paid
those same transposes, so training cost is unchanged while inference drops
the copies entirely.

No reference counterpart — the reference materializes the score maps in
eager TF (scalable_vit.py:145-198); this is TPU-side engineering.
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

BLOCK_Q = 256
BLOCK_K = 4096

_NEG_INF = -jnp.finfo(jnp.float32).max


def flash_attention_packed_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                   heads: int, dk: int, dv: int, n_k: int, block_k: int):
    """One (batch, q-block) program; heads unrolled with static lane slices.

    q_ref: (1, block_q, heads*dk); k_ref: (1, n_k_padded, heads*dk);
    v_ref: (1, n_k_padded, heads*dv); o_ref: (1, block_q, heads*dv);
    lse_ref: (1, heads, block_q).
    """
    n_k_padded = k_ref.shape[1]
    num_kb = n_k_padded // block_k
    outs = []
    for hh in range(heads):
        lo_k, lo_v = hh * dk, hh * dv
        q = q_ref[0, :, lo_k:lo_k + dk].astype(jnp.float32) * scale
        block_q = q.shape[0]

        def body(kb, carry, lo_k=lo_k, lo_v=lo_v):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(kb * block_k, block_k),
                      lo_k:lo_k + dk].astype(jnp.float32)
            v = v_ref[0, pl.ds(kb * block_k, block_k),
                      lo_v:lo_v + dv].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + kb * block_k
            s = jnp.where(col < n_k, s, _NEG_INF)

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        acc0 = jnp.zeros((block_q, dv), jnp.float32)
        m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
        outs.append(acc / jnp.maximum(l, 1e-30))
        lse_ref[0, hh, :] = (m + jnp.log(jnp.maximum(l, 1e-30))).reshape(-1)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _pad_tokens(x, block):
    pad = (-x.shape[1]) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_packed(q, k, v, heads, scale=None, interpret=False):
    """Attention over channel-packed (b, n, heads*d) q/k/v; packed output."""
    out, _ = _packed_forward(q, k, v, heads, scale, interpret)
    return out


def _packed_forward(q, k, v, heads, scale, interpret=False):
    b, n_q, hdk = q.shape
    hdv = v.shape[2]
    assert hdk % heads == 0 and hdv % heads == 0
    dk, dv = hdk // heads, hdv // heads
    if scale is None:
        scale = dk ** -0.5
    n_k = k.shape[1]
    block_q = min(BLOCK_Q, max(8, n_q))
    block_k = min(BLOCK_K, -(-n_k // 128) * 128)
    assert n_k <= 4096, (
        "flash_attention_packed keeps full K/V VMEM-resident per program "
        f"(n_k={n_k} > 4096 exhausts VMEM) — use the head-major streaming "
        "kernel (flash_attention_v2)")

    qp = _pad_tokens(q, block_q)
    kp = _pad_tokens(k, block_k)
    vp = _pad_tokens(v, block_k)
    n_qp, n_kp = qp.shape[1], kp.shape[1]

    grid = (b, n_qp // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, heads=heads, dk=dk,
                          dv=dv, n_k=n_k, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hdk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kp, hdk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kp, hdv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hdv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_qp, hdv), q.dtype),
            jax.ShapeDtypeStruct((b, heads, n_qp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * heads * n_qp * n_kp * (dk + dv),
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * heads * n_qp * n_kp,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    return out[:, :n_q, :], lse[:, :, :n_q]


def _split_heads(x, heads):
    b, n, hd = x.shape
    d = hd // heads
    return x.reshape(b, n, heads, d).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _fwd(q, k, v, heads, scale, interpret):
    out, lse = _packed_forward(q, k, v, heads, scale, interpret)
    return out, (q, k, v, out, lse)


def _bwd(heads, scale, interpret, res, g):
    # Head-major transposes here cost exactly what autodiff of the old
    # rearrange-then-flash path paid; only interpret=True (tests) takes the
    # interpret-mode streaming backward.
    q, k, v, out, lse = res
    dk = q.shape[-1] // heads
    dv = v.shape[-1] // heads
    s = dk ** -0.5 if scale is None else scale

    if dk != dv:
        # The streaming backward kernel assumes one head width; recompute
        # through XLA for the (rare) dim_key != dim_value configs.
        from vit_tpu.ops.attention import _xla_attention

        def f(q_, k_, v_):
            outh = _xla_attention(_split_heads(q_, heads),
                                  _split_heads(k_, heads),
                                  _split_heads(v_, heads), scale=s)
            return _merge_heads(outh)

        _, vjp = jax.vjp(f, q, k, v)
        return vjp(g)

    from vit_tpu.ops.flash_backward import flash_backward

    qh, kh, vh, outh, gh = (_split_heads(t, heads) for t in (q, k, v, out, g))
    if interpret:
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            dq, dk_, dv_ = flash_backward(qh, kh, vh, outh, lse, gh, s)
    else:
        dq, dk_, dv_ = flash_backward(qh, kh, vh, outh, lse, gh, s)
    return _merge_heads(dq), _merge_heads(dk_), _merge_heads(dv_)


flash_attention_packed.defvjp(_fwd, _bwd)
