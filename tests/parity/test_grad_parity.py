"""Gradient parity: TF GradientTape vs jax.grad on the transplanted ViT.

Beyond logit parity, the backward pass must agree — this catches wrong
custom VJPs, dtype casts in the backward, and transplant-layout mistakes
that forward-only tests can mask."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu import ViT
from vit_tpu.interop import tf_weights


def test_vit_grad_parity(tf):
    import vit as ref_vit

    cfg = dict(image_size=32, patch_size=8, num_classes=5,
               dim=32, depth=2, heads=2, mlp_dim=64, dim_head=16)
    img = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)

    tfm = ref_vit.ViT(**cfg)
    with tf.GradientTape() as tape:
        logits = tfm(tf.constant(img), training=False)
        loss = tf.reduce_mean(tf.square(logits))
    tf_grads = tape.gradient(loss, tfm.trainable_variables)
    tf_grad_by_name = {}
    for var, g in zip(tfm.trainable_variables, tf_grads):
        tf_grad_by_name[id(var)] = np.asarray(g)

    ours = ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_vit(tfm, variables)

    def loss_fn(v):
        out = ours.apply(v, jnp.asarray(img))
        return jnp.mean(out ** 2)

    jax_grads = jax.grad(loss_fn)(
        jax.tree.map(jnp.asarray, variables))["params"]

    # Check a representative set of leaves against their TF counterparts.
    checks = [
        (jax_grads["patch_embedding"]["kernel"],
         tfm.patch_embedding.layers[1].kernel),
        (jax_grads["cls_token"], tfm.cls_token),
        (jax_grads["pos_embedding"], tfm.pos_embedding),
        (jax_grads["transformer"]["attn_0"]["to_qkv"]["kernel"],
         tfm.transformer.layers[0][0].fn.to_qkv.kernel),
        (jax_grads["transformer"]["mlp_1"]["fc2"]["kernel"],
         tfm.transformer.layers[1][1].fn.net.layers[3].kernel),
        (jax_grads["head"]["kernel"], tfm.mlp_head.layers[1].kernel),
        (jax_grads["head_norm"]["scale"], tfm.mlp_head.layers[0].gamma),
    ]
    with tf.GradientTape() as tape:
        logits = tfm(tf.constant(img), training=False)
        loss = tf.reduce_mean(tf.square(logits))
    tf_vars = [v for _, v in checks]
    tf_gs = tape.gradient(loss, tf_vars)
    for (jg, _), tg in zip(checks, tf_gs):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)
