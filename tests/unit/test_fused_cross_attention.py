"""Fused cross-attention block kernel (Twins global attention /
ScalableViT SSA shape): numerics vs the exact XLA composition —
Pallas interpreter on CPU."""

import jax
import jax.numpy as jnp
from einops import rearrange

from vit_tpu.ops.fused_cross_attention import fused_cross_attention_block


def _ref(x, xn, wq, k, v, wo, bo, heads, dh_k, dh_v):
    q = jnp.dot(xn, wq, preferred_element_type=jnp.float32).astype(x.dtype)
    q = rearrange(q, "b n (h d) -> b h n d", h=heads)
    kh = rearrange(k, "b n (h d) -> b h n d", h=heads)
    vh = rearrange(v, "b n (h d) -> b h n d", h=heads)
    s = jnp.einsum("bhid,bhjd->bhij", q, kh,
                   preferred_element_type=jnp.float32) * dh_k ** -0.5
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhij,bhjd->bhid", p, vh,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = rearrange(o, "b h n d -> b n (h d)")
    y = jnp.dot(o, wo, preferred_element_type=jnp.float32) + bo
    return x + y.astype(x.dtype)


def _args(b=3, n=64, nk=9, c=48, heads=2, dh_k=16, dh_v=24):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    return (
        jax.random.normal(ks[0], (b, n, c), jnp.float32),
        jax.random.normal(ks[1], (b, n, c), jnp.float32),
        jax.random.normal(ks[2], (c, heads * dh_k)) * 0.1,
        jax.random.normal(ks[3], (b, nk, heads * dh_k)),
        jax.random.normal(ks[4], (b, nk, heads * dh_v)),
        jax.random.normal(ks[5], (heads * dh_v, c)) * 0.1,
        jax.random.normal(ks[6], (c,)) * 0.1,
    ), heads, dh_k, dh_v


def test_forward_matches_xla():
    args, heads, dh_k, dh_v = _args()
    y = fused_cross_attention_block(*args, heads, dh_k, dh_v, None, True)
    yr = _ref(*args, heads, dh_k, dh_v)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5


def test_vjp_matches_xla():
    args, heads, dh_k, dh_v = _args()
    gf = jax.grad(lambda a: jnp.sum(jnp.sin(fused_cross_attention_block(
        *a, heads, dh_k, dh_v, None, True))))(args)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(_ref(*a, heads, dh_k, dh_v))))(args)
    names = ["dx", "dxn", "dwq", "dk", "dv", "dwo", "dbo"]
    for name, a, b in zip(names, gf, gr):
        rel = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)
        assert rel < 1e-5, f"{name}: rel {rel}"


def test_batch_padding():
    args, heads, dh_k, dh_v = _args(b=5, n=24, nk=4)
    y = fused_cross_attention_block(*args, heads, dh_k, dh_v, None, True)
    yr = _ref(*args, heads, dh_k, dh_v)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5


def test_scalable_vit_fused_matches_exact():
    from vit_tpu.models.scalable_vit import ScalableViT

    def make(mode):
        return ScalableViT(num_classes=9, dim=32, heads=(2, 4), depth=(1, 1),
                           reduction_factor=(4, 2), window_size=(8, None),
                           ssa_dim_key=(16, 16), ssa_dim_value=(16, 16),
                           iwsa_dim_key=(16, 16), iwsa_dim_value=(16, 16),
                           fused_attention=mode)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    ref = make("never")
    fused = make("interpret")
    params = ref.init(jax.random.PRNGKey(1), x)
    params_f = fused.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    y_ref = ref.apply(params, x)
    y_fused = fused.apply(params, x)
    assert jnp.max(jnp.abs(y_ref - y_fused)) < 1e-4
    g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(ref.apply(p, x))))(params)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.sin(fused.apply(p, x))))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        assert jnp.max(jnp.abs(a - b)) < 1e-3
