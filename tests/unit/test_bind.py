"""Reference-style bound-model convenience."""

import jax
import jax.numpy as jnp

from vit_tpu import ViT, bind
from vit_tpu.models.levit import LeViT


def test_bind_vit_call_like_reference():
    v = bind(ViT(image_size=64, patch_size=16, num_classes=10, dim=32,
                 depth=1, heads=2, mlp_dim=64),
             jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    preds = v(img)
    assert preds.shape == (2, 10)
    # repeated call reuses the jitted function and is deterministic
    assert jnp.allclose(preds, v(img))


def test_bind_existing_variables():
    m = ViT(image_size=32, patch_size=8, num_classes=3, dim=32, depth=1,
            heads=2, mlp_dim=64)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    v = bind(m, variables)
    assert v(jnp.zeros((1, 32, 32, 3))).shape == (1, 3)


def test_bind_batchnorm_training_updates_state():
    m = LeViT(image_size=64, num_classes=4, dim=32, depth=1, heads=2,
              mlp_mult=2, dim_key=8, dim_value=16)
    v = bind(m, jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)))
    before = v.variables["batch_stats"]["stage_0"]["attn_0"]["to_q_bn"]["mean"]
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = v(img, training=True, rngs={"dropout": jax.random.PRNGKey(2)})
    after = v.variables["batch_stats"]["stage_0"]["attn_0"]["to_q_bn"]["mean"]
    assert out.shape == (2, 4)
    assert not jnp.allclose(before, after)
