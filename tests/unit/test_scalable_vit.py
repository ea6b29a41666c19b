"""Shape/jit tests: ScalableViT (paper block order, SURVEY.md §8.3)."""

import jax
import jax.numpy as jnp

from vit_tpu.models.scalable_vit import ScalableViT


def _tiny(**over):
    kw = dict(num_classes=11, dim=32, heads=(2, 4), depth=(1, 1),
              reduction_factor=(4, 2), window_size=(8, None),
              ssa_dim_key=(16, 16), ssa_dim_value=(16, 16),
              iwsa_dim_key=(16, 16), iwsa_dim_value=(16, 16))
    kw.update(over)
    return ScalableViT(**kw)


def test_scalable_vit_shape():
    m = _tiny()
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(params, img)
    assert out.shape == (2, 11)
    assert jnp.all(jnp.isfinite(out))


def test_fused_conv_mlp_matches_exact():
    """The ff1/ff2 conv-MLPs through the fused kernel (interpret mode on
    CPU) ≡ the exact XLA path, values and grads, same param tree."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    ref = _tiny(fused_mlp="never", fused_attention="never")
    fused = _tiny(fused_mlp="interpret", fused_attention="never")

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
