"""Fused LSA routing for ViT-for-small-datasets.

LSA (reference vit_for_small_dataset.py:88-121) = pre-LN attention with a
learnable log-temperature scaling the logits and the diagonal self-masked
to -f32.max.  Both fold into the existing fused attention-block kernel's
operands (``apply_fused_lsa_block``): the temperature into the q-third of
the wqkv operand (chain rule delivers its gradient), the mask as the
``(1, n, n)`` additive bias CrossFormer's DPB already uses.  These tests
pin the fused route (interpret mode on CPU) against the eager LSA path —
forward and every parameter gradient, temperature included.
"""

import jax
import jax.numpy as jnp

from vit_tpu.models import vit_for_small_dataset


def _model(fused_attention):
    # image 96 / patch 8 -> n = 145 tokens (>=128 routes the token-major
    # tier in interpret mode; 145 % 8 != 0 with dmodel 64 also exercises
    # the token-pad path under the diagonal bias).
    return vit_for_small_dataset.ViT(
        image_size=96, patch_size=8, num_classes=11, dim=64, depth=2,
        heads=4, dim_head=16, mlp_dim=128, fused_attention=fused_attention,
        fused_mlp="never")


def test_fused_lsa_matches_eager_forward_and_grads():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 96, 3))
    m_ref = _model("never")
    m_fused = _model("interpret")
    params = m_ref.init(jax.random.PRNGKey(0), x)
    params_fused = m_fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_fused)

    y_ref = m_ref.apply(params, x)
    y_fused = m_fused.apply(params, x)
    assert y_fused.shape == y_ref.shape == (2, 11)
    assert float(jnp.max(jnp.abs(y_ref - y_fused))) < 1e-4

    def loss(model):
        return lambda p: jnp.sum(jnp.sin(model.apply(p, x)))

    g_ref = jax.grad(loss(m_ref))(params)
    g_fused = jax.grad(loss(m_fused))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert err / scale < 1e-3, \
            f"{jax.tree_util.keystr(path)}: rel {err / scale}"


def test_temperature_gradient_flows_through_fused_route():
    """The temperature grad must be nonzero and match eager — it rides the
    wqkv-fold outside the kernel's custom VJP."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 96, 96, 3))
    m_ref = _model("never")
    m_fused = _model("interpret")
    params = m_ref.init(jax.random.PRNGKey(0), x)

    def tgrads(model):
        g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
        return [g["params"][f"attn_{i}"]["temperature"] for i in range(2)]

    for i, (tr, tf) in enumerate(zip(tgrads(m_ref), tgrads(m_fused))):
        assert float(jnp.abs(tr)) > 0.0, f"layer {i}: eager temp grad is 0"
        assert float(jnp.abs(tr - tf)) / (float(jnp.abs(tr)) + 1e-9) < 1e-3, \
            f"layer {i}: {tr} vs {tf}"
