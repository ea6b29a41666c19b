"""Shape/jit tests: LeViT, CvT (BatchNorm models)."""

import jax
import jax.numpy as jnp

from vit_tpu.models.cvt import CvT
from vit_tpu.models.levit import LeViT, cast_tuple


def test_levit_cast_tuple():
    assert cast_tuple(5, 3) == (5, 5, 5)
    assert cast_tuple((1, 2), 3) == (1, 2, 2)
    assert cast_tuple((1, 2, 3), 3) == (1, 2, 3)


def test_levit_shape():
    m = LeViT(image_size=64, num_classes=10, stages=3, dim=(32, 48, 64),
              depth=1, heads=(2, 3, 4), mlp_mult=2, dim_key=8, dim_value=16)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(variables, img)
    assert out.shape == (2, 10)
    assert jnp.all(jnp.isfinite(out))


def test_levit_distill_head():
    m = LeViT(image_size=64, num_classes=10, dim=32, depth=1, heads=2,
              mlp_mult=2, dim_key=8, dim_value=16, num_distill_classes=10)
    img = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), img)
    out, distill = m.apply(variables, img)
    assert out.shape == (1, 10) and distill.shape == (1, 10)


def test_levit_batchnorm_training_updates_stats():
    m = LeViT(image_size=64, num_classes=4, dim=32, depth=1, heads=2,
              mlp_mult=2, dim_key=8, dim_value=16)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), img)
    _, updates = m.apply(variables, img, training=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    before = variables["batch_stats"]["stage_0"]["attn_0"]["to_q_bn"]["mean"]
    after = updates["batch_stats"]["stage_0"]["attn_0"]["to_q_bn"]["mean"]
    assert not jnp.allclose(before, after)


def test_cvt_shape():
    m = CvT(num_classes=13, s1_depth=1, s2_depth=1, s3_depth=1)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(variables, img)
    assert out.shape == (2, 13)
    assert jnp.all(jnp.isfinite(out))
