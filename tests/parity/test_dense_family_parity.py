"""Golden parity for the dense-token family vs the TF reference."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.layers.common import Transformer
from vit_tpu.models import cait, deepvit, efficient, parallel_vit
from tests.parity.conftest import assert_close


def _img(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_deepvit_parity(tf):
    import deepvit as ref

    cfg = dict(image_size=48, patch_size=16, num_classes=21,
               dim=64, depth=2, heads=4, mlp_dim=128, dim_head=16)
    img = _img((2, 48, 48, 3))
    tfm = ref.DeepViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = deepvit.DeepViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_deepvit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="DeepViT logits")


def test_cait_parity(tf):
    import cait as ref

    cfg = dict(image_size=48, patch_size=16, num_classes=15, dim=64,
               depth=2, cls_depth=2, heads=2, mlp_dim=128, dim_head=32)
    img = _img((2, 48, 48, 3), seed=3)
    tfm = ref.CaiT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = cait.CaiT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cait(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="CaiT logits")


def test_parallel_vit_parity(tf):
    import parallel_vit as ref

    cfg = dict(image_size=48, patch_size=16, num_classes=12, dim=64,
               depth=2, heads=2, mlp_dim=128, num_parallel_branches=2,
               dim_head=32)
    img = _img((2, 48, 48, 3), seed=5)
    tfm = ref.ViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = parallel_vit.ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_parallel_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="Parallel ViT logits")


def test_efficient_vit_parity(tf):
    import efficient as ref
    import vit as ref_vit

    img = _img((2, 48, 48, 3), seed=7)
    tf_encoder = ref_vit.Transformer(dim=64, depth=2, heads=2,
                                     dim_head=32, mlp_dim=128)
    tfm = ref.ViT(image_size=48, patch_size=16, num_classes=9, dim=64,
                  transformer=tf_encoder)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    encoder = Transformer(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128)
    ours = efficient.ViT(image_size=48, patch_size=16, num_classes=9,
                         dim=64, transformer=encoder)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_efficient_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="Efficient ViT logits")
