"""VMEM-resident short-sequence attention kernel: numerics vs XLA.

The kernel is explicit-use only (auto-dispatch measured slower than XLA's
own VMEM-resident attention at reference shapes — see ops/attention.py),
but its fwd + custom VJP must stay exact.
"""

import jax
import jax.numpy as jnp

from vit_tpu.ops.short_attention import short_attention


def _ref(q, k, v, scale):
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _qkv(b, h, nq, nk, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return (jax.random.normal(ks[0], (b, h, nq, d), jnp.float32),
            jax.random.normal(ks[1], (b, h, nk, d), jnp.float32),
            jax.random.normal(ks[2], (b, h, nk, d), jnp.float32))


def test_forward_self_attention():
    q, k, v = _qkv(2, 3, 197, 197, 64)
    sc = 64 ** -0.5
    assert jnp.max(jnp.abs(short_attention(q, k, v, sc, True)
                           - _ref(q, k, v, sc))) < 1e-5


def test_forward_cross_attention():
    q, k, v = _qkv(2, 2, 65, 130, 32)
    sc = 32 ** -0.5
    assert jnp.max(jnp.abs(short_attention(q, k, v, sc, True)
                           - _ref(q, k, v, sc))) < 1e-5


def test_vjp_matches_xla():
    q, k, v = _qkv(2, 3, 49, 49, 64)
    sc = 64 ** -0.5
    gf = jax.grad(lambda a: jnp.sum(jnp.sin(short_attention(*a, sc, True))))(
        (q, k, v))
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(_ref(*a, sc))))((q, k, v))
    for name, a, b in zip("qkv", gf, gr):
        assert jnp.max(jnp.abs(a - b)) < 1e-5, f"d{name}"


def test_head_batch_padding():
    # b·h = 6 not divisible by typical g — exercises the pad/slice path.
    q, k, v = _qkv(3, 2, 33, 33, 32)
    sc = 32 ** -0.5
    assert jnp.max(jnp.abs(short_attention(q, k, v, sc, True)
                           - _ref(q, k, v, sc))) < 1e-5
