"""Golden parity for the objective wrappers vs the TF reference.

Masking randomness is synchronized by monkeypatching the index draw on both
sides.  Reference-side defects are patched to their paper-correct intent so
values are comparable (documented divergences, SURVEY.md §8):
* MAE — ``tf.square(pred, target)`` (target passed as op *name*) is patched
  to a real squared error (§8.2).
"""

import types

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models.vit import ViT
from vit_tpu.objectives import mae as mae_mod
from vit_tpu.objectives import simmim as simmim_mod
from vit_tpu.objectives.distill import DistillableViT
from tests.parity.conftest import assert_close

ENC_CFG = dict(image_size=64, patch_size=16, num_classes=10, dim=64,
               depth=2, heads=2, mlp_dim=128, dim_head=32)


def _tf_proxy(tf, **overrides):
    """A pass-through proxy for the tf module with call-time overrides."""
    proxy = types.SimpleNamespace()
    proxy.__dict__.update({k: getattr(tf, k) for k in dir(tf)
                           if not k.startswith("_")})
    proxy.__dict__.update(overrides)
    return proxy


def _patch_vit_build(tf):
    """Keras 3: Model.build() does not materialize nested Sequential weights,
    which breaks the reference MAE/SimMIM constructors (mae.py:32-38) — and
    mae.py runs a live demo at import time (SURVEY.md §8.1), so the patch
    must land before ``import mae``.  Build via a dummy forward instead."""
    import vit as ref_vit

    def build_via_forward(self, input_shape):
        if getattr(self, "_building_via_fwd", False):
            return
        self._building_via_fwd = True
        try:
            shape = [1 if d is None else int(d) for d in input_shape]
            self(tf.zeros(shape), training=False)
        finally:
            self._building_via_fwd = False

    ref_vit.ViT.build = build_via_forward
    return ref_vit


def test_mae_parity_synchronized_mask(tf):
    ref_vit = _patch_vit_build(tf)
    import mae as ref

    batch, num_patches = 2, 16
    perm = np.stack([np.random.RandomState(s).permutation(num_patches)
                     for s in (1, 2)]).astype(np.int32)

    img = np.random.RandomState(89).randn(batch, 64, 64, 3).astype(np.float32)

    tf_enc = ref_vit.ViT(**ENC_CFG)
    tfm = ref.MAE(image_size=64, encoder=tf_enc, decoder_dim=32,
                  masking_ratio=0.75, decoder_depth=1)
    # Synchronize the permutation and fix §8.2 (square's 2nd arg is a name).
    ref.tf = _tf_proxy(
        tf,
        argsort=lambda x, axis=-1: tf.constant(perm),
        square=lambda a, b: tf.square(a - b),
    )
    tf_loss = float(tfm(tf.constant(img), training=False))

    orig = mae_mod.random_masking_indices
    mae_mod.random_masking_indices = lambda key, b, n: jnp.asarray(perm)
    try:
        ours = mae_mod.MAE(image_size=64, encoder=ViT(**ENC_CFG),
                           decoder_dim=32, masking_ratio=0.75,
                           decoder_depth=1)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
        v = tf_weights.to_mutable(variables)
        p = v["params"]
        # the MAE encoder subtree only materializes the params MAE uses
        # (no classifier head) — transplant piecewise
        enc = p["encoder"]
        tf_weights.dense(enc, "patch_embedding",
                         tfm.encoder.patch_embedding.layers[1])
        tf_weights.set_(enc, "cls_token", tf_weights.t(tfm.encoder.cls_token))
        tf_weights.set_(enc, "pos_embedding",
                        tf_weights.t(tfm.encoder.pos_embedding))
        tf_weights.transplant_transformer(enc, "transformer",
                                          tfm.encoder.transformer)
        tf_weights.dense(p, "enc_to_dec", tfm.enc_to_dec)
        tf_weights.set_(p, "mask_token", tf_weights.t(tfm.mask_token))
        tf_weights.transplant_transformer(p, "decoder", tfm.decoder)
        tf_weights.embedding(p, "decoder_pos_emb", tfm.decoder_pos_emb)
        tf_weights.dense(p, "to_pixels", tfm.to_pixels)
        jax_loss = float(ours.apply(v, jnp.asarray(img)))
    finally:
        mae_mod.random_masking_indices = orig

    np.testing.assert_allclose(jax_loss, tf_loss, atol=1e-4)


def test_simmim_parity_synchronized_mask(tf):
    ref_vit = _patch_vit_build(tf)
    import simmim as ref

    batch, num_patches = 2, 16
    noise = np.random.RandomState(5).rand(batch, num_patches).astype(np.float32)
    num_masked = 8
    idx = np.argsort(-noise, axis=-1)[:, :num_masked].astype(np.int32)

    img = np.random.RandomState(97).randn(batch, 64, 64, 3).astype(np.float32)

    tf_enc = ref_vit.ViT(**ENC_CFG)
    tfm = ref.SimMIM(image_size=64, encoder=tf_enc, masking_ratio=0.5)
    rnd = types.SimpleNamespace(uniform=lambda shape, **kw: tf.constant(noise),
                                normal=tf.random.normal)
    ref.tf = _tf_proxy(tf, random=rnd)
    tf_loss = float(tfm(tf.constant(img), training=False))

    orig = simmim_mod.masked_topk_indices
    simmim_mod.masked_topk_indices = lambda key, b, n, k: jnp.asarray(idx)
    try:
        ours = simmim_mod.SimMIM(image_size=64, encoder=ViT(**ENC_CFG),
                                 masking_ratio=0.5)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
        v = tf_weights.to_mutable(variables)
        p = v["params"]
        enc = p["encoder"]
        tf_weights.dense(enc, "patch_embedding",
                         tfm.encoder.patch_embedding.layers[1])
        tf_weights.set_(enc, "cls_token", tf_weights.t(tfm.encoder.cls_token))
        tf_weights.set_(enc, "pos_embedding",
                        tf_weights.t(tfm.encoder.pos_embedding))
        tf_weights.transplant_transformer(enc, "transformer",
                                          tfm.encoder.transformer)
        tf_weights.set_(p, "mask_token", tf_weights.t(tfm.mask_token))
        tf_weights.dense(p, "to_pixels", tfm.to_pixels)
        jax_loss = float(ours.apply(v, jnp.asarray(img)))
    finally:
        simmim_mod.masked_topk_indices = orig

    np.testing.assert_allclose(jax_loss, tf_loss, atol=1e-4)


def test_mpp_parity_synchronized_mask(tf):
    """MPP loss pinned against the patched reference (SURVEY.md §8.7/§8.15).

    The reference's random-patch swap and mask-token replacement mutate
    ``.numpy()`` *copies* of eager tensors (§8.16 — verified no-ops in this
    environment), so the reference encoder always sees uncorrupted patches;
    our side runs with corruption probabilities 0 to match.  The reference's
    CE (prediction passed as labels, integer bucket id as logits, §8.7) and
    the clip-to-constant target (§8.15) are patched to paper-correct on the
    TF side.  This pins the whole bucketize/bin-weighted-target pipeline
    (reference mpp.py:109-131) and the masked-CE reduction end to end.
    """
    ref_vit = _patch_vit_build(tf)
    import mpp as ref

    batch, num_patches = 2, 16
    # synchronized mask subset: 3 masked patches per row (ceil(0.15·16))
    rs = np.random.RandomState(11)
    mask_bool = np.zeros((batch, num_patches), bool)
    for b in range(batch):
        mask_bool[b, rs.choice(num_patches, 3, replace=False)] = True

    img = np.random.RandomState(7).rand(batch, 64, 64, 3).astype(np.float32)

    tf_enc = ref_vit.ViT(**ENC_CFG)

    def fixed_ce(pred, target_label):
        # §8.7: paper-correct CE(one_hot(bucket), predicted_logits)
        labels = tf.one_hot(tf.cast(tf.squeeze(target_label, -1), tf.int32),
                            depth=pred.shape[-1])
        return tf.nn.softmax_cross_entropy_with_logits(labels=labels,
                                                       logits=pred)

    nn_proxy = types.SimpleNamespace()
    nn_proxy.__dict__.update({k: getattr(tf.nn, k) for k in dir(tf.nn)
                              if not k.startswith("_")})
    nn_proxy.softmax_cross_entropy_with_logits = fixed_ce
    ref.tf = _tf_proxy(
        tf,
        nn=nn_proxy,
        # §8.15: clamp from above only instead of clip-to-constant
        clip_by_value=lambda t, clip_value_min, clip_value_max:
            tf.minimum(t, clip_value_max),
    )
    orig_subset = ref.get_mask_subset_with_prob
    ref.get_mask_subset_with_prob = lambda inp, prob: tf.constant(mask_bool)
    try:
        tfm = ref.MPP(image_size=64, transformer=tf_enc, patch_size=16)
        tf_loss = float(tfm(tf.constant(img), training=False))
    finally:
        ref.get_mask_subset_with_prob = orig_subset

    from vit_tpu.objectives import mpp as mpp_mod

    orig = mpp_mod.get_mask_subset_with_prob
    mpp_mod.get_mask_subset_with_prob = (
        lambda batch, seq_len, prob, key: jnp.asarray(mask_bool))
    try:
        ours = mpp_mod.MPP(image_size=64, transformer=ViT(**ENC_CFG),
                           patch_size=16, replace_prob=0.0,
                           random_patch_prob=0.0)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
        v = tf_weights.to_mutable(variables)
        p = v["params"]
        enc = p["transformer"]
        tf_weights.dense(enc, "patch_embedding",
                         tfm.transformer.patch_embedding.layers[1])
        tf_weights.set_(enc, "cls_token",
                        tf_weights.t(tfm.transformer.cls_token))
        tf_weights.set_(enc, "pos_embedding",
                        tf_weights.t(tfm.transformer.pos_embedding))
        tf_weights.transplant_transformer(enc, "transformer",
                                          tfm.transformer.transformer)
        tf_weights.dense(p, "to_bits", tfm.to_bits)
        tf_weights.set_(p, "mask_token", tf_weights.t(tfm.mask_token))
        jax_loss = float(ours.apply(v, jnp.asarray(img)))
    finally:
        mpp_mod.get_mask_subset_with_prob = orig

    np.testing.assert_allclose(jax_loss, tf_loss, atol=1e-4)


def test_distillable_vit_parity(tf):
    import distill as ref

    img = np.random.RandomState(101).randn(2, 64, 64, 3).astype(np.float32)
    tfm = ref.DistillableViT(**ENC_CFG)
    distill_token = tf.random.normal([1, 1, ENC_CFG["dim"]], seed=3)
    tf_logits, tf_distill = tfm(tf.constant(img),
                                distill_token=distill_token, training=False)

    ours = DistillableViT(**ENC_CFG)
    token = jnp.asarray(distill_token.numpy())
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img),
                          distill_token=token)
    variables = tf_weights.transplant_vit(tfm, variables)
    jax_logits, jax_distill = ours.apply(variables, jnp.asarray(img),
                                         distill_token=token)
    assert_close(jax_logits, tf_logits.numpy(), label="DistillableViT logits")
    assert_close(jax_distill, tf_distill.numpy(),
                 label="DistillableViT distill tokens")
