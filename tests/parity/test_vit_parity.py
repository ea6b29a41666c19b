"""Golden parity: TF reference ViT vs vit-tpu ViT with transplanted weights.

North-star fidelity gate (BASELINE.json): max |logit diff| <= 1e-4.
Reference model: /root/reference/vit_tensorflow/vit.py:106-177.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu import ViT
from vit_tpu.interop import tf_weights
from tests.parity.conftest import assert_close


def test_vit_logit_parity(tf):
    import vit as ref_vit  # reference module (flat sibling import layout)

    cfg = dict(
        image_size=64, patch_size=16, num_classes=50,
        dim=128, depth=3, heads=4, mlp_dim=256, dim_head=32,
    )
    img = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)

    tfm = ref_vit.ViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))

    assert_close(jax_out, tf_out, atol=1e-4, label="ViT logits")


def test_vit_mean_pool_parity(tf):
    import vit as ref_vit

    cfg = dict(
        image_size=32, patch_size=8, num_classes=11,
        dim=64, depth=2, heads=2, mlp_dim=128, pool="mean",
    )
    img = np.random.RandomState(1).randn(3, 32, 32, 3).astype(np.float32)

    tfm = ref_vit.ViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))

    assert_close(jax_out, tf_out, atol=1e-4, label="ViT mean-pool logits")


def test_from_tensorflow_dispatch(tf):
    import vit as ref_vit
    from vit_tpu.interop.tf_weights import from_tensorflow

    cfg = dict(image_size=32, patch_size=8, num_classes=4,
               dim=32, depth=1, heads=2, mlp_dim=64, dim_head=16)
    img = np.random.RandomState(3).randn(1, 32, 32, 3).astype(np.float32)
    tfm = ref_vit.ViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = from_tensorflow(tfm, variables)
    assert_close(ours.apply(variables, jnp.asarray(img)), tf_out,
                 label="from_tensorflow ViT")


def test_vit_large_patch_einsum_embed_parity(tf):
    """patch_dim >= 1536 routes through the 5-D einsum patch embedding
    (ops/patchify.patch_embed) — pin that path against the reference too
    (the other configs here use patch 16/8, which keep the fused form)."""
    import vit as ref_vit

    from vit_tpu.ops.patchify import patch_embed_wins

    cfg = dict(
        image_size=64, patch_size=32, num_classes=13,
        dim=128, depth=2, heads=4, mlp_dim=256, dim_head=32,
    )
    assert patch_embed_wins(32, 32, 3)
    img = np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32)

    tfm = ref_vit.ViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))

    assert_close(jax_out, tf_out, atol=1e-4, label="ViT /32 einsum embed")
