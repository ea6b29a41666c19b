"""Flash-attention kernel correctness (interpret mode on CPU) and
dispatch-gate behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops import flash_attention as fa
from vit_tpu.ops.attention import _xla_attention, scaled_dot_product_attention


@pytest.mark.parametrize("n,d", [(64, 64), (197, 64), (256, 128)])
def test_flash_matches_xla_interpret(n, d):
    from jax.experimental.pallas import tpu as pltpu

    b, h = 2, 3
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, scale=scale)
    with pltpu.force_tpu_interpret_mode():
        out, lse = fa._flash_forward(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # lse is a valid per-row logsumexp of the scaled logits
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    ref_lse = jax.scipy.special.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-5)


def test_flash_backward_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = 1, 2, 64, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))
    scale = d ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=scale) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, scale) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_dispatch_gate_uses_xla_on_cpu():
    # On the CPU test backend the kernel is unavailable — the public op must
    # silently fall back to XLA.
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 64))
    out = scaled_dot_product_attention(q, q, q)
    assert out.shape == q.shape


def test_flash_backward_cross_attention_nonaligned():
    """Streaming bwd with n_q ≠ n_k and non-block-multiple lengths."""
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, nk, d = 1, 2, 70, 130, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, nq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, nk, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, nk, d))
    scale = d ** -0.5

    g_ref = jax.grad(lambda *a: jnp.sum(
        _xla_attention(*a, scale=scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_fl = jax.grad(lambda *a: jnp.sum(
            fa.flash_attention(*a, scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_flash_v2_backward_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from vit_tpu.ops.flash_attention_v2 import flash_attention_v2

    b, h, n, d = 1, 2, 300, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))
    scale = d ** -0.5

    g_ref = jax.grad(lambda *a: jnp.sum(
        _xla_attention(*a, scale=scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_fl = jax.grad(lambda *a: jnp.sum(
            flash_attention_v2(*a, scale, 128, 128) ** 2),
            argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


@pytest.mark.parametrize("n,d,bq,bk", [(300, 64, 128, 128), (512, 128, 256, 256)])
def test_flash_v2_matches_xla_interpret(n, d, bq, bk):
    from jax.experimental.pallas import tpu as pltpu

    from vit_tpu.ops.flash_attention_v2 import flash_attention_v2

    b, h = 2, 2
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, scale=scale)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_v2(q, k, v, scale, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_dispatch_pads_odd_head_dim():
    """ScalableViT's dim_key=40 path: the dispatcher zero-pads q/k/v to the
    64-lane block and slices the output — exact same attention."""
    from jax.experimental.pallas import tpu as pltpu

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (2, 2, 64, 40))
    k = jax.random.normal(ks[1], (2, 2, 48, 40))
    v = jax.random.normal(ks[2], (2, 2, 48, 40))
    scale = 40 ** -0.5
    with pltpu.force_tpu_interpret_mode():
        out = scaled_dot_product_attention(q, k, v, scale=scale,
                                           use_flash="force")
    ref = scaled_dot_product_attention(q, k, v, scale=scale,
                                       use_flash="never")
    assert out.shape == (2, 2, 64, 40)
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_flash_native_d96_forward_and_backward():
    """d=96 (the next multiple of 32 past the lane width) also skips the
    64-block pad — cover the widened rule beyond the d=32 shape that was
    measured on-chip (exp_scalable_iwsa.py)."""
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = 1, 2, 128, 96
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in ks)
    scale = d ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=scale) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(scaled_dot_product_attention(
            q, k, v, scale=scale, use_flash="force") ** 2)

    with pltpu.force_tpu_interpret_mode():
        out = scaled_dot_product_attention(q, k, v, scale=scale,
                                           use_flash="force")
        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = _xla_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_use_flash_16bit_1024_tier(monkeypatch):
    """The 16-bit n>=1024 tier lives in the dispatcher (not in model code):
    bf16 at n=1024 qualifies, f32 at n=1024 does not, bias disqualifies."""
    from vit_tpu.ops.attention import _use_flash

    monkeypatch.setattr(fa, "flash_attention_available", lambda: True)
    q16 = jnp.zeros((1, 2, 1024, 32), jnp.bfloat16)
    q32 = jnp.zeros((1, 2, 1024, 32), jnp.float32)
    bias = jnp.zeros((1, 1, 1024, 1024), jnp.bfloat16)
    assert _use_flash(q16, q16, q16, None, None)
    assert not _use_flash(q32, q32, q32, None, None)
    assert not _use_flash(q16, q16, q16, bias, None)
    q2k = jnp.zeros((1, 2, 2048, 32), jnp.float32)
    assert _use_flash(q2k, q2k, q2k, None, None)


def test_force_flash_rejects_bias():
    q = jnp.zeros((1, 1, 16, 32))
    bias = jnp.zeros((1, 1, 16, 16))
    with pytest.raises(AssertionError):
        scaled_dot_product_attention(q, q, q, bias=bias, use_flash="force")


def test_flash_native_d32_forward_and_backward():
    """d=32 rides flash unpadded (the dispatch skips the 64-block pad for
    multiples of 32 — ScalableViT's IWSA dim_key): forward AND the
    streaming backward must match XLA at the narrow lane dim."""
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = 1, 2, 128, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in ks)
    scale = d ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=scale) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(scaled_dot_product_attention(
            q, k, v, scale=scale, use_flash="force") ** 2)

    with pltpu.force_tpu_interpret_mode():
        out = scaled_dot_product_attention(q, k, v, scale=scale,
                                           use_flash="force")
        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = _xla_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)
