"""Golden parity: NesT and MobileViT vs TF reference."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models.mobile_vit import MobileViT
from vit_tpu.models.nest import NesT
from tests.parity.conftest import assert_close


def test_nest_parity(tf):
    import nest as ref

    # Keras 3 rejects uppercase padding in MaxPool2D (nest.py:118).
    real = tf.keras.layers.MaxPool2D

    def MaxPool2D(pool_size=(2, 2), strides=None, padding="valid", **kw):
        if isinstance(padding, str):
            padding = padding.lower()
        return real(pool_size=pool_size, strides=strides, padding=padding, **kw)

    ref.nn.MaxPool2D = MaxPool2D

    cfg = dict(image_size=64, patch_size=4, num_classes=7, dim=32, heads=2,
               num_hierarchies=3, block_repeats=(1, 1, 2))
    img = np.random.RandomState(73).randn(2, 64, 64, 3).astype(np.float32)
    tfm = ref.NesT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = NesT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_nest(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="NesT logits")


def test_mobile_vit_parity(tf):
    import mobile_vit as ref
    from einops import rearrange

    # Reference defect (SURVEY.md §8.13): mobile_vit.py:101 transposes the
    # 5-D (b p h n d) keys with a 4-element perm — crashes on any call.
    # Patch with the intended last-two-dims transpose.
    def fixed_attn_call(self, x, training=True):
        qkv = self.to_qkv(x)
        qkv = tf.split(qkv, num_or_size_splits=3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b p n (h d) -> b p h n d", h=self.heads),
            qkv)
        dots = tf.matmul(q, tf.transpose(k, perm=[0, 1, 2, 4, 3])) * self.scale
        attn = self.attend(dots)
        out = tf.matmul(attn, v)
        out = rearrange(out, "b p h n d -> b p n (h d)")
        return self.to_out(out, training=training)

    ref.Attention.call = fixed_attn_call

    cfg = dict(image_size=(128, 128), dims=[32, 40, 48],
               channels=[8, 12, 16, 16, 24, 24, 32, 32, 40, 40, 128],
               num_classes=11, depths=(1, 1, 1))
    img = np.random.RandomState(79).randn(2, 128, 128, 3).astype(np.float32)
    tfm = ref.MobileViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = MobileViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_mobile_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="MobileViT logits")
