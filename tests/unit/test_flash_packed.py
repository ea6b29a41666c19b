"""Channel-packed flash kernel (interpret mode) + packed dispatcher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops.attention import _xla_attention, packed_window_attention
from vit_tpu.ops.flash_attention_packed import (_merge_heads, _split_heads,
                                                flash_attention_packed)


def _ref_packed(q, k, v, heads, scale):
    out = _xla_attention(_split_heads(q, heads), _split_heads(k, heads),
                         _split_heads(v, heads), scale=scale)
    return _merge_heads(out)


@pytest.mark.parametrize("n,heads,dk", [(256, 2, 32), (300, 2, 32),
                                        (128, 4, 16)])
def test_packed_matches_xla_interpret(n, heads, dk):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (2, n, heads * dk)) for kk in ks)
    scale = dk ** -0.5
    out = flash_attention_packed(q, k, v, heads, scale, True)
    ref = _ref_packed(q, k, v, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_distinct_value_width():
    """dim_key != dim_value (IWSA's split): v rides its own per-head width."""
    heads, dk, dv, n = 2, 32, 48, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (2, n, heads * dk))
    k = jax.random.normal(ks[1], (2, n, heads * dk))
    v = jax.random.normal(ks[2], (2, n, heads * dv))
    scale = dk ** -0.5
    out = flash_attention_packed(q, k, v, heads, scale, True)
    ref = _merge_heads(_xla_attention(
        _split_heads(q, heads), _split_heads(k, heads),
        _split_heads(v, heads), scale=scale))
    assert out.shape == (2, n, heads * dv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_backward_matches_xla():
    heads, dk, n = 2, 32, 256
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (1, n, heads * dk)) for kk in ks)
    scale = dk ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(_ref_packed(q, k, v, heads, scale) ** 2)

    def loss_packed(q, k, v):
        return jnp.sum(flash_attention_packed(q, k, v, heads, scale,
                                              True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pk = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_pk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_packed_backward_distinct_widths_xla_recompute():
    """dk != dv takes the XLA-recompute backward branch."""
    heads, dk, dv, n = 2, 16, 32, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (1, n, heads * dk))
    k = jax.random.normal(ks[1], (1, n, heads * dk))
    v = jax.random.normal(ks[2], (1, n, heads * dv))
    scale = dk ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(_merge_heads(_xla_attention(
            _split_heads(q, heads), _split_heads(k, heads),
            _split_heads(v, heads), scale=scale)) ** 2)

    def loss_packed(q, k, v):
        return jnp.sum(flash_attention_packed(q, k, v, heads, scale,
                                              True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pk = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_pk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_packed_dispatcher_cpu_fallback():
    """On the CPU backend the kernel is unavailable; the dispatcher must
    fall back to the head-major path and stay exact."""
    heads, dk, n = 2, 32, 64
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (jax.random.normal(kk, (2, n, heads * dk)) for kk in ks)
    out = packed_window_attention(q, k, v, heads)
    ref = _ref_packed(q, k, v, heads, dk ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_scalable_vit_iwsa_interpret_matches_never():
    """Model-level: the packed-kernel IWSA routing (fused_attention=
    'interpret') reproduces the XLA path on a tiny ScalableViT."""
    from vit_tpu import ScalableViT

    kw = dict(num_classes=7, dim=32, heads=(2, 2, 2, 2), depth=(1, 1, 1, 1),
              ssa_dim_key=(8, 8, 8, 8), reduction_factor=(8, 4, 2, 1),
              window_size=(8, 4, None, None))
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    m_never = ScalableViT(fused_attention="never", fused_mlp="never", **kw)
    params = m_never.init(jax.random.PRNGKey(1), img)
    ref = m_never.apply(params, img)
    m_int = ScalableViT(fused_attention="interpret", fused_mlp="never", **kw)
    out = m_int.apply(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_use_flash_gate_logic_with_forced_availability(monkeypatch):
    """Exercise every branch of _use_flash on CPU.

    The r5 NameError (``v`` referenced but not a parameter) escaped the CPU
    suite because flash_attention_available() short-circuits the gate off
    TPU; forcing it True makes the whole decision table run under pytest.
    """
    from vit_tpu.ops import attention as att
    from vit_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "flash_attention_available", lambda: True)

    def mk(n, d, dv=None, dtype=jnp.float32):
        q = jnp.zeros((1, 2, n, d), dtype)
        k = jnp.zeros((1, 2, n, d), dtype)
        v = jnp.zeros((1, 2, n, dv or d), dtype)
        return q, k, v

    q, k, v = mk(4096, 64)
    assert att._use_flash(q, k, v, None, None)
    # bias/mask suppress
    assert not att._use_flash(q, k, v, jnp.zeros((1, 1, 4096, 4096)), None)
    assert not att._use_flash(q, k, v, None, jnp.zeros((1, 1, 4096, 4096), bool))
    # dk != dv suppresses (flash kernels assume one head width)
    q, k, v = mk(4096, 32, dv=48)
    assert not att._use_flash(q, k, v, None, None)
    # 16-bit n>=1024 tier; f32 keeps the n>=2048 gate
    q, k, v = mk(1024, 64, dtype=jnp.bfloat16)
    assert att._use_flash(q, k, v, None, None)
    q, k, v = mk(1024, 64)
    assert not att._use_flash(q, k, v, None, None)
    q, k, v = mk(512, 64, dtype=jnp.bfloat16)
    assert not att._use_flash(q, k, v, None, None)
