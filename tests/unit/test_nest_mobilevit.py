"""Shape/jit tests: NesT, MobileViT."""

import jax
import jax.numpy as jnp

from vit_tpu.models.mobile_vit import MobileViT
from vit_tpu.models.nest import NesT


def test_nest_shape():
    m = NesT(image_size=64, patch_size=4, num_classes=12, dim=32, heads=2,
             num_hierarchies=3, block_repeats=(1, 1, 1))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(params, img)
    assert out.shape == (2, 12)
    assert jnp.all(jnp.isfinite(out))


def test_mobile_vit_shape():
    m = MobileViT(image_size=(128, 128), dims=[32, 40, 48],
                  channels=[8, 12, 16, 16, 24, 24, 32, 32, 40, 40, 128],
                  num_classes=9, depths=(1, 1, 1))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    variables = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(variables, img)
    assert out.shape == (2, 9)
    assert jnp.all(jnp.isfinite(out))
