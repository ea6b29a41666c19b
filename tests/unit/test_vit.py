"""Shape/dtype/jit tests for the canonical ViT (reference vit.py:179-195
usage block: (1, 256, 256, 3) -> (1, 1000))."""

import jax
import jax.numpy as jnp
import pytest

from vit_tpu import ViT


def test_vit_forward_shape():
    v = ViT(
        image_size=256, patch_size=32, num_classes=1000,
        dim=128, depth=2, heads=4, mlp_dim=256,
    )
    img = jnp.zeros((2, 256, 256, 3))
    params = v.init(jax.random.PRNGKey(0), img)
    out = v.apply(params, img)
    assert out.shape == (2, 1000)
    assert jnp.all(jnp.isfinite(out))


def test_vit_mean_pool_and_rectangular():
    # Rectangular images/patches (reference README.md:909-957).
    v = ViT(
        image_size=(256, 128), patch_size=(32, 16), num_classes=10,
        dim=64, depth=1, heads=2, mlp_dim=128, pool="mean",
    )
    img = jnp.zeros((1, 256, 128, 3))
    params = v.init(jax.random.PRNGKey(0), img)
    out = v.apply(params, img)
    assert out.shape == (1, 10)


def test_vit_jit_matches_eager():
    v = ViT(
        image_size=64, patch_size=16, num_classes=7,
        dim=32, depth=2, heads=2, mlp_dim=64,
    )
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = v.init(jax.random.PRNGKey(0), img)
    eager = v.apply(params, img)
    jitted = jax.jit(lambda p, x: v.apply(p, x))(params, img)
    assert jnp.allclose(eager, jitted, atol=1e-6)


def test_vit_dropout_determinism_and_training_mode():
    v = ViT(
        image_size=64, patch_size=16, num_classes=7,
        dim=32, depth=1, heads=2, mlp_dim=64, dropout=0.5, emb_dropout=0.5,
    )
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = v.init(jax.random.PRNGKey(0), img)
    # Inference path must ignore dropout (no rng needed).
    out1 = v.apply(params, img)
    out2 = v.apply(params, img)
    assert jnp.allclose(out1, out2)
    # Training path is keyed and reproducible.
    key = jax.random.PRNGKey(42)
    t1 = v.apply(params, img, training=True, rngs={"dropout": key})
    t2 = v.apply(params, img, training=True, rngs={"dropout": key})
    t3 = v.apply(params, img, training=True, rngs={"dropout": jax.random.PRNGKey(7)})
    assert jnp.allclose(t1, t2)
    assert not jnp.allclose(t1, t3)


def test_vit_invalid_config():
    with pytest.raises(AssertionError):
        ViT(image_size=100, patch_size=32, num_classes=10,
            dim=32, depth=1, heads=2, mlp_dim=64)
    with pytest.raises(AssertionError):
        ViT(image_size=64, patch_size=32, num_classes=10,
            dim=32, depth=1, heads=2, mlp_dim=64, pool="max")
