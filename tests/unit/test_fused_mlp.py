"""Fused LN+MLP Pallas block: numerics vs the exact XLA path.

Runs the kernel in Pallas interpreter mode on CPU (the suite's backend);
the real-chip dispatch is shape-identical, so interpreter parity + the
on-chip benchmarks in benchmarks/ cover the op.
"""

import jax
import jax.numpy as jnp
import pytest

from vit_tpu.layers.common import Transformer
from vit_tpu.ops.fused_mlp import fused_mlp, fused_mlp_3d


def _ref_mlp(x, gamma, beta, w1, b1, w2, b2, eps=1e-3):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    h = jnp.dot(xn, w1, preferred_element_type=jnp.float32) + b1
    g = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    o = jnp.dot(g, w2, preferred_element_type=jnp.float32) + b2
    return x + o.astype(x.dtype)


def _args(t=197, d=96, hd=160, dtype=jnp.float32):
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    return (
        jax.random.normal(k[0], (t, d), dtype),
        jax.random.normal(k[1], (d,)) * 0.1 + 1.0,
        jax.random.normal(k[2], (d,)) * 0.1,
        (jax.random.normal(k[3], (d, hd)) * 0.05).astype(dtype),
        (jax.random.normal(k[4], (hd,)) * 0.05).astype(dtype),
        (jax.random.normal(k[5], (hd, d)) * 0.05).astype(dtype),
        (jax.random.normal(k[6], (d,)) * 0.05).astype(dtype),
    )


def test_forward_matches_xla():
    args = _args()
    y = fused_mlp(*args, 1e-3, 64, True, "erf")
    yr = _ref_mlp(*args)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5


def test_forward_nondivisible_tokens():
    # t=67 with block 64: one full + one partial (padded) block.
    args = _args(t=67)
    y = fused_mlp(*args, 1e-3, 64, True, "erf")
    yr = _ref_mlp(*args)
    assert y.shape == yr.shape
    assert jnp.max(jnp.abs(y - yr)) < 1e-5


def test_vjp_matches_xla():
    args = _args()

    def loss_f(a):
        return jnp.sum(jnp.sin(fused_mlp(*a, 1e-3, 64, True, "erf")))

    def loss_r(a):
        return jnp.sum(jnp.sin(_ref_mlp(*a)))

    gf = jax.grad(loss_f)(args)
    gr = jax.grad(loss_r)(args)
    for name, a, b in zip(["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"],
                          gf, gr):
        scale = jnp.max(jnp.abs(b)) + 1e-6
        rel = jnp.max(jnp.abs(a - b)) / scale
        assert rel < 1e-5, f"{name}: rel err {rel}"


def test_transformer_interpret_mode_matches_unfused():
    """The in-model wiring: fused_mlp='interpret' must reproduce the exact
    path (f32, CPU) and keep the identical param tree."""
    kw = dict(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 64))

    t_ref = Transformer(**kw, fused_mlp="never")
    params = t_ref.init(jax.random.PRNGKey(0), x)
    t_fused = Transformer(**kw, fused_mlp="interpret")
    params_fused = t_fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_fused)

    y_ref = t_ref.apply(params, x)
    y_fused = t_fused.apply(params, x)
    assert jnp.max(jnp.abs(y_ref - y_fused)) < 1e-5

    g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(t_ref.apply(p, x))))(params)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.sin(t_fused.apply(p, x))))(params)
    leaves_r, leaves_f = jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)
    for a, b in zip(leaves_r, leaves_f):
        assert jnp.max(jnp.abs(a - b)) < 1e-4


def test_gelu_approximation_accuracy():
    """Both in-kernel GELU forms must be sub-bf16-resolution vs exact erf."""
    from vit_tpu.ops.fused_mlp import _dgelu, _gelu

    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    assert jnp.max(jnp.abs(exact - _gelu(x, "erf"))) < 1e-6
    # tanh form: |err| well below bf16 ulp at activation scale (~8e-3 at 1.0)
    assert jnp.max(jnp.abs(exact - _gelu(x, "tanh"))) < 1e-3
    dexact = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    assert jnp.max(jnp.abs(dexact - _dgelu(x, "erf"))) < 1e-5
    assert jnp.max(jnp.abs(dexact - _dgelu(x, "tanh"))) < 4e-3


def test_vjp_self_consistent_tanh():
    """Production (tanh) mode: kernel VJP must match autodiff of the same
    tanh-GELU math exactly — validates the backward plumbing."""
    from vit_tpu.ops.fused_mlp import _gelu

    args = _args()

    def ref_tanh(x, gamma, beta, w1, b1, w2, b2, eps=1e-3):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
        h = jnp.dot(xn, w1, preferred_element_type=jnp.float32) + b1
        g = _gelu(h, "tanh").astype(x.dtype)
        o = jnp.dot(g, w2, preferred_element_type=jnp.float32) + b2
        return x + o.astype(x.dtype)

    gf = jax.grad(lambda a: jnp.sum(jnp.sin(fused_mlp(*a, 1e-3, 64, True))))(args)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(ref_tanh(*a))))(args)
    for name, a, b in zip(["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"],
                          gf, gr):
        scale = jnp.max(jnp.abs(b)) + 1e-6
        assert jnp.max(jnp.abs(a - b)) / scale < 1e-5, name


def test_forward_vjp_3d():
    """3-D (b, n, d) input takes the batch-blocked path (no host-side
    flatten); forward and all grads must match the flattened reference."""
    b, n, d, hd = 6, 33, 96, 160
    args2 = _args(t=b * n, d=d, hd=hd)
    args3 = (args2[0].reshape(b, n, d),) + args2[1:]

    y = fused_mlp(*args3, 1e-3, 64, True, "erf")
    yr = _ref_mlp(*args2).reshape(b, n, d)
    assert y.shape == (b, n, d)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5

    gf = jax.grad(lambda a: jnp.sum(jnp.sin(
        fused_mlp(*a, 1e-3, 64, True, "erf"))))(args3)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(_ref_mlp(*a))))(args2)
    for name, a, r in zip(["dx", "dgamma", "dbeta", "dw1", "db1", "dw2",
                           "db2"], gf, gr):
        if name == "dx":
            a = a.reshape(b * n, d)
        rel = jnp.max(jnp.abs(a - r)) / (jnp.max(jnp.abs(r)) + 1e-6)
        assert rel < 1e-5, f"{name}: rel err {rel}"


def test_fused_mlp_residual_in_custom_encoders():
    """The custom encoders route their pre-norm MLP half through
    fused_mlp_residual; interpret mode must match the exact path with the
    identical param tree (checkpoint/transplant compatible)."""
    from vit_tpu.models.vit_for_small_dataset import ViT as SmallViT

    kw = dict(image_size=32, patch_size=8, num_classes=5, dim=64, depth=2,
              heads=2, dim_head=32, mlp_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))

    m_ref = SmallViT(**kw, fused_mlp="never")
    params = m_ref.init(jax.random.PRNGKey(1), x)
    m_fused = SmallViT(**kw, fused_mlp="interpret")
    params_fused = m_fused.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_fused)

    y_ref = m_ref.apply(params, x)
    y_fused = m_fused.apply(params, x)
    assert jnp.max(jnp.abs(y_ref - y_fused)) < 1e-5

    g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(m_ref.apply(p, x))))(params)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.sin(m_fused.apply(p, x))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        assert jnp.max(jnp.abs(a - b)) < 1e-4
