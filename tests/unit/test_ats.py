"""ATS-ViT unit tests: static shapes, token-id contract, mask plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models import ats_vit


def _model():
    return ats_vit.ViT(
        image_size=64, patch_size=8, num_classes=10, dim=64, depth=3,
        max_tokens_per_depth=(32, 16, 8), heads=2, mlp_dim=128, dim_head=32)


def test_ats_shapes_and_token_ids():
    m = _model()
    img = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    logits, token_ids = m.apply(params, img, return_sampled_token_ids=True,
                                rngs={"ats": jax.random.PRNGKey(5)})
    assert logits.shape == (3, 10)
    # static width = last max_tokens_per_depth
    assert token_ids.shape == (3, 8)
    ids = np.asarray(token_ids)
    # -1 is padding; valid ids are within the 64-patch range
    assert ids.min() >= -1 and ids.max() < 64
    # valid ids are unique per sample
    for row in ids:
        valid = row[row >= 0]
        assert len(set(valid.tolist())) == len(valid)


def test_ats_deterministic_without_rng():
    m = _model()
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    o1 = m.apply(params, img)
    o2 = m.apply(params, img)
    assert jnp.allclose(o1, o2)


def test_ats_jit():
    m = _model()
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    eager = m.apply(params, img, rngs={"ats": jax.random.PRNGKey(3)})
    jitted = jax.jit(lambda p, x: m.apply(p, x, rngs={"ats": jax.random.PRNGKey(3)}))(params, img)
    assert jnp.allclose(eager, jitted, atol=1e-5)


def test_ats_no_sampling_when_tokens_below_threshold():
    # max tokens >= n-1 at every depth -> no sampling; ids = identity
    m = ats_vit.ViT(image_size=32, patch_size=8, num_classes=5, dim=32,
                    depth=2, max_tokens_per_depth=(64, 32), heads=2,
                    mlp_dim=64, dim_head=16)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    logits, token_ids = m.apply(params, img, return_sampled_token_ids=True)
    assert token_ids.shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(token_ids),
                                  np.tile(np.arange(16), (2, 1)))
