"""Hybrid short-sequence layer kernels (ln_gemm / attention_nb / proj_mlp):
numerics vs the exact XLA path (interpreter mode on CPU; on-chip
measurements recorded in ROUND2_NOTES.md).  The Transformer-level dispatch
is covered by test_fused_attention_block's
test_transformer_interpret_hybrid_tier_matches_unfused, which routes
through the hybrid layer at n < 128 with a lane-packable head geometry."""

import jax
import jax.numpy as jnp

from vit_tpu.ops.fused_hybrid import ln_gemm, proj_mlp


def _ln(x, gamma, beta, eps=1e-3):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _ref_ln_gemm(x, gamma, beta, w, eps=1e-3):
    xn = _ln(x, gamma, beta, eps).astype(x.dtype)
    return jnp.dot(xn, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _ref_proj_mlp(x, o, wo, bo, gamma, beta, w1, b1, w2, b2, eps=1e-3):
    y = x + (jnp.dot(o, wo, preferred_element_type=jnp.float32)
             + bo).astype(x.dtype)
    xn = _ln(y, gamma, beta, eps).astype(x.dtype)
    h = jnp.dot(xn, w1, preferred_element_type=jnp.float32) + b1
    g = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    return y + (jnp.dot(g, w2, preferred_element_type=jnp.float32)
                + b2).astype(x.dtype)


def _ln_gemm_args(t=133, d=96, dout=192):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return (
        jax.random.normal(ks[0], (t, d), jnp.float32),
        jax.random.normal(ks[1], (d,)) * 0.1 + 1.0,
        jax.random.normal(ks[2], (d,)) * 0.1,
        jax.random.normal(ks[3], (d, dout)) * 0.05,
    )


def _proj_mlp_args(t=133, d=96, inner=64, hdim=160):
    ks = jax.random.split(jax.random.PRNGKey(1), 10)
    return (
        jax.random.normal(ks[0], (t, d), jnp.float32),
        jax.random.normal(ks[1], (t, inner), jnp.float32),
        jax.random.normal(ks[2], (inner, d)) * 0.05,
        jax.random.normal(ks[3], (d,)) * 0.05,
        jax.random.normal(ks[4], (d,)) * 0.1 + 1.0,
        jax.random.normal(ks[5], (d,)) * 0.1,
        jax.random.normal(ks[6], (d, hdim)) * 0.05,
        jax.random.normal(ks[7], (hdim,)) * 0.05,
        jax.random.normal(ks[8], (hdim, d)) * 0.05,
        jax.random.normal(ks[9], (d,)) * 0.05,
    )


def test_ln_gemm_forward():
    args = _ln_gemm_args()
    y = ln_gemm(*args, 1e-3, 64, True)  # block_t=64 with t=133: pad path
    yr = _ref_ln_gemm(*args)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5


def test_ln_gemm_vjp():
    args = _ln_gemm_args()
    gf = jax.grad(lambda a: jnp.sum(jnp.sin(
        ln_gemm(*a, 1e-3, 64, True))))(args)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(_ref_ln_gemm(*a))))(args)
    for name, a, b in zip(["dx", "dgamma", "dbeta", "dw"], gf, gr):
        rel = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)
        assert rel < 1e-5, f"{name}: rel {rel}"


def test_ln_gemm_split_outputs():
    """nsplit=3 returns the q|k|v column thirds; grads must match the
    fused-output form."""
    args = _ln_gemm_args(dout=192)
    q, k, v = ln_gemm(*args, 1e-3, 64, True, 3)
    yr = _ref_ln_gemm(*args)
    fused = jnp.concatenate([q, k, v], axis=-1)
    assert jnp.max(jnp.abs(fused - yr)) < 1e-5

    def loss_split(a):
        q, k, v = ln_gemm(*a, 1e-3, 64, True, 3)
        return jnp.sum(jnp.sin(q) + jnp.cos(k) * jnp.sin(v))

    def loss_ref(a):
        y = _ref_ln_gemm(*a)
        q, k, v = jnp.split(y, 3, axis=-1)
        return jnp.sum(jnp.sin(q) + jnp.cos(k) * jnp.sin(v))

    gf = jax.grad(loss_split)(args)
    gr = jax.grad(loss_ref)(args)
    for name, a, b in zip(["dx", "dgamma", "dbeta", "dw"], gf, gr):
        rel = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)
        assert rel < 1e-5, f"{name}: rel {rel}"


def test_attention_nb_matches_xla():
    """(n, b, h·dh) q/k/v attention kernel vs the einsum reference, forward
    and VJP, with a batch that exercises axis-1 padding and a head count
    that exercises pack=4 (dh=32)."""
    from vit_tpu.ops.fused_hybrid import _attn_pack, attention_nb

    n, b, heads, dh = 33, 18, 4, 32
    assert _attn_pack(heads, dh) == 4
    inner = heads * dh
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    qkv = tuple(jax.random.normal(k, (n, b, inner), jnp.float32) for k in ks)

    def ref(q, k, v):
        q, k, v = (t.reshape(n, b, heads, dh) for t in (q, k, v))
        s = jnp.einsum("ibhd,jbhd->bhij", q, k,
                       preferred_element_type=jnp.float32) * dh ** -0.5
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhij,jbhd->ibhd", p, v,
                          preferred_element_type=jnp.float32) \
            .reshape(n, b, inner)

    o = attention_nb(*qkv, heads, dh, None, True)
    assert jnp.max(jnp.abs(o - ref(*qkv))) < 1e-5

    gf = jax.grad(lambda a: jnp.sum(jnp.sin(
        attention_nb(*a, heads, dh, None, True))))(qkv)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(ref(*a))))(qkv)
    for name, a, b_ in zip(["dq", "dk", "dv"], gf, gr):
        rel = jnp.max(jnp.abs(a - b_)) / (jnp.max(jnp.abs(b_)) + 1e-9)
        assert rel < 1e-5, f"{name} rel {rel}"


def test_attn_pack_geometries():
    from vit_tpu.ops.fused_hybrid import _attn_pack

    assert _attn_pack(16, 64) == 2    # the B/32 headline geometry
    assert _attn_pack(12, 64) == 2
    assert _attn_pack(8, 128) == 1
    assert _attn_pack(4, 256) == 1
    assert _attn_pack(4, 32) == 4
    assert _attn_pack(3, 64) is None  # odd heads can't pair
    assert _attn_pack(8, 96) is None  # 96 doesn't tile 128


def test_proj_mlp_forward():
    args = _proj_mlp_args()
    z = proj_mlp(*args, 1e-3, 64, True, "erf")
    zr = _ref_proj_mlp(*args)
    assert jnp.max(jnp.abs(z - zr)) < 1e-5


def test_proj_mlp_vjp():
    args = _proj_mlp_args()
    gf = jax.grad(lambda a: jnp.sum(jnp.sin(
        proj_mlp(*a, 1e-3, 64, True, "erf"))))(args)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(_ref_proj_mlp(*a))))(args)
    names = ["dx", "do", "dwo", "dbo", "dgamma", "dbeta", "dw1", "db1",
             "dw2", "db2"]
    for name, a, b in zip(names, gf, gr):
        rel = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)
        assert rel < 2e-5, f"{name}: rel {rel}"
