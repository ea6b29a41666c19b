"""Golden parity: LeViT and CvT vs TF reference (eval mode, moving BN stats)."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models.cvt import CvT
from vit_tpu.models.levit import LeViT
from tests.parity.conftest import assert_close


def _img(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_levit_parity(tf):
    import levit as ref

    cfg = dict(image_size=64, num_classes=17, stages=2, dim=(32, 48),
               depth=1, heads=(2, 3), mlp_mult=2, dim_key=8, dim_value=16)
    img = _img((2, 64, 64, 3), seed=43)
    tfm = ref.LeViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = LeViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_levit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="LeViT logits")


def test_levit_distill_parity(tf):
    import levit as ref

    cfg = dict(image_size=32, num_classes=5, stages=1, dim=32, depth=1,
               heads=2, mlp_mult=2, dim_key=8, dim_value=16,
               num_distill_classes=7)
    img = _img((2, 32, 32, 3), seed=47)
    tfm = ref.LeViT(**cfg)
    tf_out, tf_distill = tfm(tf.constant(img), training=False)

    ours = LeViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_levit(tfm, variables)
    jax_out, jax_distill = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out.numpy(), label="LeViT logits")
    assert_close(jax_distill, tf_distill.numpy(), label="LeViT distill")


def test_cvt_parity(tf):
    import cvt as ref

    cfg = dict(num_classes=11, s1_emb_dim=32, s1_heads=1, s1_depth=1,
               s2_emb_dim=48, s2_heads=2, s2_depth=1,
               s3_emb_dim=64, s3_heads=2, s3_depth=2)
    img = _img((2, 64, 64, 3), seed=53)
    tfm = ref.CvT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = CvT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cvt(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="CvT logits")
