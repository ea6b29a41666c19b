"""Golden parity: SPT/LSA ViT, ViT+PatchMerger, CrossViT vs TF reference."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models import cross_vit, vit_for_small_dataset, vit_with_patch_merger
from tests.parity.conftest import assert_close


def _img(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_small_dataset_vit_parity(tf):
    import vit_for_small_dataset as ref

    cfg = dict(image_size=48, patch_size=16, num_classes=19,
               dim=64, depth=2, heads=4, mlp_dim=128, dim_head=16)
    img = _img((2, 48, 48, 3), seed=11)
    tfm = ref.ViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = vit_for_small_dataset.ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_small_dataset_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="SPT/LSA ViT logits")


def test_patch_merger_vit_parity(tf):
    import vit_with_patch_merger as ref

    cfg = dict(image_size=48, patch_size=16, num_classes=23, dim=64,
               depth=4, heads=4, mlp_dim=128, patch_merge_layer=2,
               patch_merge_num_tokens=4, dim_head=16)
    img = _img((2, 48, 48, 3), seed=13)
    tfm = ref.ViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = vit_with_patch_merger.ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_patch_merger_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="PatchMerger ViT logits")


def test_cross_vit_parity(tf):
    import cross_vit as ref

    # The reference crashes under Keras 3: CrossTransformer passes the python
    # bool ``kv_include_self=True`` alongside a tensor kwarg into a nested
    # Layer call (cross_vit.py:157-158), which Keras 3 rejects ("cannot mix
    # tensors and non-tensors").  Route the flag via context-presence instead
    # — semantics unchanged (the flag is always True when context is given).
    _orig_attn_call = ref.Attention.call

    def _attn_call(self, x, context=None, kv_include_self=False, training=True):
        return _orig_attn_call(self, x, context=context,
                               kv_include_self=context is not None,
                               training=training)

    def _cross_call(self, inputs, training=True):
        sm_tokens, lg_tokens = inputs
        (sm_cls, sm_patch), (lg_cls, lg_patch) = map(
            lambda t: (t[:, :1], t[:, 1:]), (sm_tokens, lg_tokens))
        for sm_attend_lg, lg_attend_sm in self.layers:
            sm_cls = sm_attend_lg(sm_cls, context=lg_patch,
                                  training=training) + sm_cls
            lg_cls = lg_attend_sm(lg_cls, context=sm_patch,
                                  training=training) + lg_cls
        return (tf.concat([sm_cls, sm_patch], axis=1),
                tf.concat([lg_cls, lg_patch], axis=1))

    ref.Attention.call = _attn_call
    ref.CrossTransformer.call = _cross_call

    cfg = dict(image_size=48, num_classes=13, sm_dim=48, lg_dim=64,
               sm_patch_size=8, lg_patch_size=16, sm_enc_depth=1,
               lg_enc_depth=2, sm_enc_mlp_dim=96, lg_enc_mlp_dim=128,
               sm_enc_heads=2, lg_enc_heads=2, sm_enc_dim_head=16,
               lg_enc_dim_head=16, cross_attn_depth=2, cross_attn_heads=2,
               cross_attn_dim_head=16, depth=2, dropout=0.0, emb_dropout=0.0)
    img = _img((2, 48, 48, 3), seed=17)
    tfm = ref.CrossViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = cross_vit.CrossViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cross_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="CrossViT logits")
