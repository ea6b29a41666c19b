"""Shape/jit tests: RegionViT."""

import jax
import jax.numpy as jnp
import pytest

from vit_tpu.models.regionvit import RegionViT


def test_regionvit_shape():
    m = RegionViT(dim=(32, 48, 64, 96), depth=(1, 1, 1, 1), window_size=4,
                  num_classes=8, local_patch_size=4)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(params, img)
    assert out.shape == (2, 8)
    assert jnp.all(jnp.isfinite(out))


def test_regionvit_3conv_and_peg():
    m = RegionViT(dim=(32, 48, 64, 96), depth=(1, 1, 1, 1), window_size=4,
                  num_classes=5, local_patch_size=4,
                  tokenize_local_3_conv=True, use_peg=True)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(params, img)
    assert out.shape == (1, 5)


def test_regionvit_divisibility_assert():
    m = RegionViT(dim=(32, 48, 64, 96), depth=(1, 1, 1, 1), window_size=7,
                  num_classes=5)
    with pytest.raises(AssertionError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
