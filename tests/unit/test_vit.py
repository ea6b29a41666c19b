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


def test_patch_embed_einsum_matches_dense():
    """The large-patch einsum embedding must match patchify + Dense exactly
    (same kernel/bias), forward and gradients."""
    import jax

    from vit_tpu.ops.patchify import patch_embed, patchify

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    img = jax.random.normal(k[0], (2, 64, 64, 3))
    w = jax.random.normal(k[1], (32 * 32 * 3, 96)) * 0.02
    b = jax.random.normal(k[2], (96,)) * 0.01

    def ref(img, w, b):
        return (patchify(img, 32, 32) @ w + b).astype(img.dtype)

    out = patch_embed(img, w, b, 32, 32)
    ref_out = ref(img, w, b)
    assert out.shape == ref_out.shape
    assert jnp.max(jnp.abs(out - ref_out)) < 1e-5

    gf = jax.grad(lambda a: jnp.sum(jnp.sin(patch_embed(*a, 32, 32))))(
        (img, w, b))
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(ref(*a))))((img, w, b))
    for name, x, y in zip(["dimg", "dw", "db"], gf, gr):
        rel = jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(y)) + 1e-9)
        assert rel < 1e-5, f"{name}: {rel}"
