"""Shape/jit tests: ScalableViT (paper block order, SURVEY.md §8.3)."""

import jax
import jax.numpy as jnp

from vit_tpu.models.scalable_vit import ScalableViT


def test_scalable_vit_shape():
    m = ScalableViT(num_classes=11, dim=32, heads=(2, 4), depth=(1, 1),
                    reduction_factor=(4, 2), window_size=(8, None),
                    ssa_dim_key=(16, 16), ssa_dim_value=(16, 16),
                    iwsa_dim_key=(16, 16), iwsa_dim_value=(16, 16))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(params, img)
    assert out.shape == (2, 11)
    assert jnp.all(jnp.isfinite(out))
