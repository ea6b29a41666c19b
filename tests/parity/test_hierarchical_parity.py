"""Golden parity: T2T-ViT and PiT vs TF reference.

PiT compares against a *patched* reference: the upstream pooling-gate bug
(pit.py:194, SURVEY.md §8.4) is fixed on the TF side before comparing, per
the defect policy (build paper-correct, pin against patched reference).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models import pit, t2t
from tests.parity.conftest import assert_close


def _img(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_extract_patches_parity(tf):
    img = _img((2, 13, 13, 3), seed=23)
    from vit_tpu.ops.patchify import extract_patches

    for kernel, stride, padding in [(3, 2, "SAME"), (7, 4, "SAME"),
                                    (3, 2, "VALID"), (4, 3, "SAME")]:
        tf_out = tf.image.extract_patches(
            tf.constant(img), sizes=[1, kernel, kernel, 1],
            strides=[1, stride, stride, 1], rates=[1, 1, 1, 1],
            padding=padding).numpy()
        ours = np.asarray(extract_patches(jnp.asarray(img), kernel, stride,
                                          padding=padding))
        np.testing.assert_allclose(ours, tf_out, atol=0,
                                   err_msg=f"k={kernel} s={stride} {padding}")


def test_t2t_parity(tf):
    import t2t as ref

    cfg = dict(image_size=48, num_classes=11, dim=64, depth=2, heads=2,
               mlp_dim=128, dim_head=32, t2t_layers=((3, 2), (3, 2)))
    img = _img((2, 48, 48, 3), seed=29)
    tfm = ref.T2TViT(**cfg)
    # Keras 3 rejects calling the reference's empty Sequential([]) used as an
    # identity output projection (vit.py:67-69, hit when heads==1 and
    # dim_head==dim in the T2T stages) — swap in a real Identity layer.
    for stage in tfm.patch_embedding.layers[:-1]:
        if not stage.is_last:
            for pre_attn, _ in stage.transformer_layer.layers:
                if len(pre_attn.fn.to_out.layers) == 0:
                    pre_attn.fn.to_out = tf.keras.layers.Identity()
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = t2t.T2TViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_t2t(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="T2T-ViT logits")


def test_pit_parity_with_patched_reference(tf):
    import pit as ref

    cfg = dict(image_size=64, patch_size=8, num_classes=9, dim=32,
               depth=(1, 1, 1), heads=2, mlp_dim=64, dim_head=16)
    img = _img((2, 64, 64, 3), seed=31)

    tfm = ref.PiT(**cfg)
    # Patch §8.4: rebuild transformer_layers with working pooling.
    seq = tf.keras.Sequential()
    dim = cfg["dim"]
    heads = ref.cast_tuple(cfg["heads"], len(cfg["depth"]))
    for ind, (layer_depth, layer_heads) in enumerate(zip(cfg["depth"], heads)):
        seq.add(ref.Transformer(dim, layer_depth, layer_heads,
                                cfg["dim_head"], cfg["mlp_dim"], 0.0))
        if ind < len(cfg["depth"]) - 1:
            seq.add(ref.Pool(dim))
            dim *= 2
    tfm.transformer_layers = seq
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = pit.PiT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_pit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="PiT logits (patched ref)")


def _patch_cct_maxpool(ref, tf):
    """Keras 3 rejects the reference's uppercase padding='SAME' in MaxPool2D
    (cct.py:200) — normalize case via a wrapper."""
    real = tf.keras.layers.MaxPool2D

    def MaxPool2D(pool_size=(2, 2), strides=None, padding="valid", **kw):
        if isinstance(padding, str):
            padding = padding.lower()
        return real(pool_size=pool_size, strides=strides, padding=padding, **kw)

    ref.nn.MaxPool2D = MaxPool2D


def test_cct_parity(tf):
    import cct as ref
    from vit_tpu.models import cct as ours_mod

    _patch_cct_maxpool(ref, tf)
    cfg = dict(img_size=64, embedding_dim=64, n_conv_layers=2, kernel_size=3,
               stride=1, num_layers=2, num_heads=2, mlp_ratio=1.0,
               num_classes=13, positional_embedding="learnable")
    img = _img((2, 64, 64, 3), seed=37)
    tfm = ref.CCT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = ours_mod.CCT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cct(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="CCT logits")


def test_cct_factory_parity(tf):
    import cct as ref
    from vit_tpu.models import cct as ours_mod

    _patch_cct_maxpool(ref, tf)
    kw = dict(img_size=64, num_classes=9, positional_embedding="none")
    img = _img((2, 64, 64, 3), seed=41)
    tfm = ref.cct_2(**kw)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = ours_mod.cct_2(**kw)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cct(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="cct_2 logits")
