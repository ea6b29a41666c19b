"""Gradient parity: TF GradientTape vs jax.grad on transplanted models.

Beyond logit parity, the backward pass must agree — this catches wrong
custom VJPs, dtype casts in the backward, and transplant-layout mistakes
that forward-only tests can mask.  Coverage targets the hard numerics
families: plain ViT, LeViT (BatchNorm + 'SAME'-padding conv gradients +
the |Δ|-indexed positional-bias Embedding), CrossFormer (windowed
attention + the dynamic-position-bias MLP whose gradient flow is the
§8.5 regression fence) and CaiT (LayerScale residual scaling +
talking-heads head mixes + the CLS-stage cross-attention).

Each test checks the *input* gradient — one tensor whose value threads
through every layer's backward — plus representative parameter leaves."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu import ViT
from vit_tpu.interop import tf_weights


def _tf_grads(tf, tfm, img, tf_vars):
    """d mean(logits²) / d (input, *tf_vars) in eval mode."""
    img_t = tf.constant(img)
    with tf.GradientTape() as tape:
        tape.watch(img_t)
        logits = tfm(img_t, training=False)
        loss = tf.reduce_mean(tf.square(logits))
    return tape.gradient(loss, [img_t] + list(tf_vars))


def _jax_grads(model, variables, img):
    def loss_fn(v, x):
        out = model.apply(v, x)
        out = out[0] if isinstance(out, tuple) else out
        return jnp.mean(out ** 2)

    return jax.grad(loss_fn, argnums=(0, 1))(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(img))


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


def test_levit_grad_parity(tf):
    """BN (moving stats) + 'SAME' asymmetric conv padding + |Δ|-indexed
    Embedding position bias, leaf-for-leaf vs tf.GradientTape
    (reference levit.py:64-139)."""
    import levit as ref

    from vit_tpu.models.levit import LeViT

    cfg = dict(image_size=64, num_classes=7, stages=2, dim=(32, 48),
               depth=1, heads=(2, 3), mlp_mult=2, dim_key=8, dim_value=16)
    img = np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32)

    tfm = ref.LeViT(**cfg)
    tfm(tf.constant(img), training=False)  # build TF weights
    ours = LeViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_levit(tfm, variables)

    stage0 = next(tr for tr in tfm.backbone.layers
                  if tr.layers and
                  tr.layers[0][0].to_q.layers[0].strides[0] == 1)
    attn0 = stage0.layers[0][0]
    tf_vars = [
        tfm.conv_embedding.layers[0].kernel,   # stem conv, 'SAME' stride 2
        attn0.to_q.layers[0].kernel,           # 1×1 conv feeding BN
        attn0.pos_bias.embeddings,             # |Δ|-indexed Embedding bias
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["conv_embedding_0"]["kernel"],
        p["stage_0"]["attn_0"]["to_q"]["kernel"],
        p["stage_0"]["attn_0"]["pos_bias"]["embedding"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        tg = tf.convert_to_tensor(tg)  # Embedding grads come as IndexedSlices
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_crossformer_grad_parity(tf):
    """Windowed attention + cross-embed convs + the DPB MLP whose gradient
    flow is the §8.5 regression fence (reference crossformer.py:51-71)."""
    import crossformer as ref

    from vit_tpu.models.crossformer import CrossFormer

    cfg = dict(num_classes=5, dim=(32, 64, 96, 128), depth=(1, 1, 1, 1),
               global_window_size=(4, 2, 2, 1), local_window_size=4,
               cross_embed_kernel_sizes=((2, 4), (2, 4), (2, 4), (2, 4)),
               cross_embed_strides=(4, 2, 2, 2))
    img = np.random.RandomState(13).randn(2, 128, 128, 3).astype(np.float32)

    tfm = ref.CrossFormer(**cfg)
    tfm(tf.constant(img), training=False)  # build TF weights
    ours = CrossFormer(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_crossformer(tfm, variables)

    cel0, tr0 = tfm.crossformer_layers[0]
    short_attn = tr0.layers[0][0]
    tf_vars = [
        cel0.convs[0].kernel,                       # cross-embed conv
        short_attn.to_qkv.kernel,                   # windowed attn proj
        short_attn.dpb.dpb_layers.layers[0].kernel, # DPB MLP first Dense
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["cel_0"]["conv_0"]["kernel"],
        p["short_attn_0_0"]["to_qkv"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:3]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)

    # §8.5 regression fence, both directions: the reference's DPB runs
    # through a .numpy() escape (crossformer.py:163) so its gradient is
    # severed (None); ours must flow and be nonzero.
    assert tf_gs[3] is None, "reference DPB grad unexpectedly connected"
    dpb_grad = p["short_attn_0_0"]["dpb"]["fc0"]["kernel"]
    assert float(jnp.max(jnp.abs(dpb_grad))) > 0.0


def test_cait_grad_parity(tf):
    """LayerScale residual scaling + talking-heads (pre/post-softmax head
    mixes) + the two-stage patch/CLS encoder, leaf-for-leaf vs
    tf.GradientTape (reference cait.py:40-48, 83-131).  Layer-drop is
    inactive in eval mode on both sides."""
    import cait as ref

    from vit_tpu.models.cait import CaiT

    cfg = dict(image_size=48, patch_size=16, num_classes=9, dim=64,
               depth=2, cls_depth=1, heads=2, mlp_dim=128, dim_head=32)
    img = np.random.RandomState(7).randn(2, 48, 48, 3).astype(np.float32)

    tfm = ref.CaiT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = CaiT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cait(tfm, variables)

    ls_attn0, _ = tfm.patch_transformer.layers[0]
    attn0 = ls_attn0.fn.fn
    cls_ls_attn0, cls_ls_mlp0 = tfm.cls_transformer.layers[0]
    tf_vars = [
        ls_attn0.scale,                     # LayerScale (patch stage)
        attn0.mix_heads_pre_attn,           # talking heads, pre-softmax
        attn0.mix_heads_post_attn,          # talking heads, post-softmax
        attn0.to_q.kernel,
        cls_ls_mlp0.scale,                  # LayerScale (CLS stage)
        cls_ls_attn0.fn.fn.to_kv.kernel,    # CLS cross-attends patches
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["patch_transformer"]["layerscale_attn_0"],
        p["patch_transformer"]["attn_0"]["mix_heads_pre_attn"],
        p["patch_transformer"]["attn_0"]["mix_heads_post_attn"],
        p["patch_transformer"]["attn_0"]["to_q"]["kernel"],
        p["cls_transformer"]["layerscale_mlp_0"],
        p["cls_transformer"]["attn_0"]["to_kv"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)
