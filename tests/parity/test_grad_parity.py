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


def test_scalable_vit_grad_parity(tf):
    """SSA conv-reduced k/v + IWSA windowing + the LIM value-residual conv,
    vs the §8.3-patched reference (paper block order SSA-FF-PEG-IWSA-FF;
    reference scalable_vit.py:222-236)."""
    import scalable_vit as ref

    from vit_tpu.models.scalable_vit import ScalableViT

    def fixed_call(self, x, training=True):
        for ssa, ff1, peg, ff2, iwsa in self.layers:
            x = ssa(x, training=training) + x
            x = ff1(x, training=training) + x
            if peg is not None:
                x = peg(x)
            x = iwsa(x, training=training) + x
            x = ff2(x, training=training) + x
        return self.norm(x)

    ref.Transformer.call = fixed_call

    cfg = dict(num_classes=9, dim=32, heads=(2, 4), depth=(1, 2),
               reduction_factor=(4, 2), window_size=(8, None),
               ssa_dim_key=(16, 16), ssa_dim_value=(16, 16),
               iwsa_dim_key=(16, 16), iwsa_dim_value=(16, 16))
    img = np.random.RandomState(17).randn(2, 128, 128, 3).astype(np.float32)

    tfm = ref.ScalableViT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = ScalableViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_scalable_vit(tfm, variables)

    ssa0, _, _, _, iwsa0 = tfm.scalable_layers[0][0].layers[0]
    tf_vars = [
        tfm.to_patches.kernel,                      # patch conv
        ssa0.fn.to_q.kernel,                        # SSA query conv
        iwsa0.fn.local_interactive_module.kernel,   # LIM 3x3 value conv
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["to_patches"]["kernel"],
        p["stage_0"]["ssa_0"]["to_q"]["kernel"],
        p["stage_0"]["iwsa_0"]["local_interactive_module"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_mobilevit_grad_parity(tf):
    """MV2 inverted-residual convs + BN (eval stats) + the unfold-windowed
    transformer, vs the §8.13-patched reference (mobile_vit.py:99-104)."""
    import mobile_vit as ref
    from einops import rearrange

    from vit_tpu.models.mobile_vit import MobileViT

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
    img = np.random.RandomState(23).randn(2, 128, 128, 3).astype(np.float32)

    tfm = ref.MobileViT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = MobileViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_mobile_vit(tfm, variables)

    mvit0 = tfm.trunk[0][1]
    tf_vars = [
        tfm.conv1.layers.layers[0].kernel,                 # stem conv (BN follows)
        mvit0.transformer.layers[0][0].fn.to_qkv.kernel,   # windowed attn proj
        mvit0.conv4.layers.layers[0].kernel,               # fusion conv
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["conv1"]["conv"]["kernel"],
        p["trunk_attn_0"]["attn_0"]["to_qkv"]["kernel"],
        p["trunk_attn_0"]["conv4"]["conv"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_ats_grad_parity(tf):
    """Backward through the adaptive token sampling: CLS-score weighted
    inverse-transform sampling, gathers, and the attention mask — with
    SYNCHRONIZED gumbel noise on both sides (see test_ats_parity)."""
    import ats_vit as ref

    from tests.parity.test_ats_parity import CFG, _sync_noise
    from vit_tpu.models import ats_vit

    _sync_noise(tf, ref, seed=11)
    img = np.random.RandomState(29).randn(2, 64, 64, 3).astype(np.float32)

    tfm = ref.ViT(**CFG)
    tfm(tf.constant(img), training=False)  # build
    ours = ats_vit.ViT(**CFG)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_ats_vit(tfm, variables)

    tf_vars = [
        tfm.patch_embedding.layers[1].kernel,
        tfm.transformer.layers[0][0].fn.to_qkv.kernel,  # pre-sampling layer
        tfm.transformer.layers[2][0].fn.to_qkv.kernel,  # post-sampling layer
        tfm.cls_token,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["patch_embedding"]["kernel"],
        p["transformer"]["attn_0"]["to_qkv"]["kernel"],
        p["transformer"]["attn_2"]["to_qkv"]["kernel"],
        p["cls_token"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_t2t_grad_parity(tf):
    """Backward through the unfold tokenizer chain ('SAME' extract_patches
    gradients, reference t2t.py:17-47) + the single-head identity-out
    stages."""
    import t2t as ref

    from vit_tpu.models import t2t

    cfg = dict(image_size=48, num_classes=11, dim=64, depth=2, heads=2,
               mlp_dim=128, dim_head=32, t2t_layers=((3, 2), (3, 2)))
    img = np.random.RandomState(31).randn(2, 48, 48, 3).astype(np.float32)

    tfm = ref.T2TViT(**cfg)
    # Keras 3 rejects the reference's empty Sequential([]) identity out-proj
    # (hit when heads==1 and dim_head==dim in T2T stages).
    for stage in tfm.patch_embedding.layers[:-1]:
        if not stage.is_last:
            for pre_attn, _ in stage.transformer_layer.layers:
                if len(pre_attn.fn.to_out.layers) == 0:
                    pre_attn.fn.to_out = tf.keras.layers.Identity()
    tfm(tf.constant(img), training=False)  # build
    ours = t2t.T2TViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_t2t(tfm, variables)

    stage0 = tfm.patch_embedding.layers[0]
    tf_vars = [
        stage0.transformer_layer.layers[0][0].fn.to_qkv.kernel,
        tfm.patch_embedding.layers[-1].kernel,  # final linear patch embed
        tfm.pos_embedding,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["t2t_transformer_0"]["attn_0"]["to_qkv"]["kernel"],
        p["patch_embedding"]["kernel"],
        p["pos_embedding"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_twins_svt_grad_parity(tf):
    """Windowed local attention (windows folded to batch), conv-reduced
    global k/v, PEG depthwise conv and conv-MLPs, leaf-for-leaf vs
    tf.GradientTape (reference twins_svt.py:117-190, 108-115)."""
    import twins_svt as ref

    from vit_tpu.models.twins_svt import TwinsSVT

    cfg = dict(num_classes=7,
               s1_emb_dim=32, s1_patch_size=4, s1_local_patch_size=4,
               s1_global_k=4, s1_depth=1,
               s2_emb_dim=48, s2_patch_size=2, s2_local_patch_size=4,
               s2_global_k=4, s2_depth=1,
               s3_emb_dim=64, s3_patch_size=2, s3_local_patch_size=2,
               s3_global_k=2, s3_depth=2,
               s4_emb_dim=96, s4_patch_size=2, s4_local_patch_size=2,
               s4_global_k=2, s4_depth=1)
    img = np.random.RandomState(21).randn(2, 128, 128, 3).astype(np.float32)

    tfm = ref.TwinsSVT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = TwinsSVT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_twins_svt(tfm, variables)

    s1 = tfm.svt_layers.layers[0]
    s3 = tfm.svt_layers.layers[2]
    local0 = s1.layers[1].layers[0][0].fn.fn     # Residual(PreNorm(Local))
    global0 = s3.layers[3].layers[0][2].fn.fn    # Residual(PreNorm(Global))
    tf_vars = [
        s1.layers[0].proj.kernel,                # patch-merge embed conv
        local0.to_q.kernel,                      # windowed local attention
        s1.layers[2].proj.fn.kernel,             # PEG depthwise conv
        global0.to_kv.kernel,                    # conv-reduced global k/v
        tfm.svt_layers.layers[4].layers[1].kernel,  # head
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["s1_embed"]["proj"]["kernel"],
        p["s1_pre_transformer"]["local_attn_0"]["to_q"]["kernel"],
        p["s1_peg"]["proj"]["kernel"],
        p["s3_transformer"]["global_attn_0"]["to_kv"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_regionvit_grad_parity(tf):
    """Region + local two-stream attention with the zero-padded relative
    position bias Embedding (reference regionvit.py:118-182, 143-155):
    gradients must flow into both tokenizer convs, the joint-attention
    qkv and the bias table."""
    import regionvit as ref

    from vit_tpu.models.regionvit import RegionViT

    cfg = dict(dim=(32, 48, 64, 96), depth=(1, 1, 2, 1), window_size=4,
               num_classes=7, local_patch_size=4)
    img = np.random.RandomState(22).randn(2, 128, 128, 3).astype(np.float32)

    tfm = ref.RegionViT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = RegionViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_regionvit(tfm, variables)

    tr0 = tfm.region_layers[0][2]
    tf_vars = [
        tfm.local_encoder.kernel,                # local tokenizer conv
        tfm.region_encoder.layers[1].kernel,     # region tokenizer conv
        tr0.layers[0][0].to_qkv.kernel,          # joint attention qkv
        tr0.local_rel_pos_bias.embeddings,       # rel-pos bias table
        tfm.to_logits.layers[2].kernel,          # head
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)
    # Embedding grads come back as IndexedSlices — densify for comparison.
    tf_gs = [tf.convert_to_tensor(g) if g is not None else None
             for g in tf_gs]

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["local_encoder"]["kernel"],
        p["region_encoder"]["kernel"],
        p["transformer_0"]["attn_0"]["to_qkv"]["kernel"],
        p["transformer_0"]["local_rel_pos_bias"]["embedding"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_nest_grad_parity(tf):
    """Block-folded attention + per-stage additive pos-emb + the
    conv/LayerNorm/maxpool Aggregate (reference nest.py:111-142):
    leaf-for-leaf vs tf.GradientTape."""
    import nest as ref

    from vit_tpu.models.nest import NesT

    # Keras 3 rejects uppercase padding in MaxPool2D (nest.py:118).
    real = tf.keras.layers.MaxPool2D

    def MaxPool2D(pool_size=(2, 2), strides=None, padding="valid", **kw):
        if isinstance(padding, str):
            padding = padding.lower()
        return real(pool_size=pool_size, strides=strides, padding=padding,
                    **kw)

    ref.nn.MaxPool2D = MaxPool2D

    cfg = dict(image_size=64, patch_size=4, num_classes=7, dim=32, heads=2,
               num_hierarchies=3, block_repeats=(1, 1, 2))
    img = np.random.RandomState(23).randn(2, 64, 64, 3).astype(np.float32)

    tfm = ref.NesT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = NesT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_nest(tfm, variables)

    tr0, agg0 = tfm.nest_layers[0]
    tf_vars = [
        tfm.patch_embedding.layers[1].kernel,    # patchify conv
        tr0.pos_emb,                             # per-stage pos-emb
        tr0.layers[0][0].fn.to_qkv.kernel,       # block attention qkv
        agg0.ag_layers.layers[0].kernel,         # aggregate conv
        tfm.mlp_head.layers[2].kernel,           # head
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["patch_embedding"]["kernel"],
        p["transformer_0"]["pos_emb"],
        p["transformer_0"]["attn_0"]["to_qkv"]["kernel"],
        p["aggregate_conv_0"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_pit_grad_parity(tf):
    """Overlapping-patch unfold tokenizer + the depthwise-conv token
    pooling that doubles dim between stages — §8.4-patched reference (the
    upstream PiT never pools; the patch rebuilds transformer_layers with
    working Pool blocks, reference pit.py:140-156, 194)."""
    import pit as ref

    from vit_tpu.models.pit import PiT

    cfg = dict(image_size=64, patch_size=8, num_classes=9, dim=32,
               depth=(1, 1, 1), heads=2, mlp_dim=64, dim_head=16)
    img = np.random.RandomState(24).randn(2, 64, 64, 3).astype(np.float32)

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
    tfm(tf.constant(img), training=False)  # build

    ours = PiT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_pit(tfm, variables)

    pool0 = tfm.transformer_layers.layers[1]
    tf_vars = [
        tfm.patch_embedding.layers[1].kernel,        # unfold tokenizer Dense
        tfm.pos_embedding,
        pool0.cls_ff.kernel,                         # pool CLS projection
        pool0.downsample.net.layers[0].kernel,       # depthwise pooling conv
        tfm.mlp_head.layers[1].kernel,               # head
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["patch_embedding"]["kernel"],
        p["pos_embedding"],
        p["pool_0"]["cls_ff"]["kernel"],
        p["pool_0"]["downsample_grouped"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_cvt_grad_parity(tf):
    """Depthwise-conv q/k/v projections with BatchNorm inside the attention
    (reference cvt.py:94-127): gradients through the BN-eval path, the
    strided k/v convs and the conv-MLPs, leaf-for-leaf."""
    import cvt as ref

    from vit_tpu.models.cvt import CvT

    cfg = dict(num_classes=11, s1_emb_dim=32, s1_heads=1, s1_depth=1,
               s2_emb_dim=48, s2_heads=2, s2_depth=1,
               s3_emb_dim=64, s3_heads=2, s3_depth=2)
    img = np.random.RandomState(25).randn(2, 64, 64, 3).astype(np.float32)

    tfm = ref.CvT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = CvT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cvt(tfm, variables)

    s1_tr = tfm.cvt_layers.layers[0].layers[2]
    attn0 = s1_tr.layers[0][0].fn
    tf_vars = [
        tfm.cvt_layers.layers[0].layers[0].kernel,   # s1 conv embed
        attn0.to_q.net.layers[0].kernel,             # depthwise q conv
        attn0.to_kv.net.layers[2].kernel,            # pointwise kv conv
        attn0.to_out.layers[0].kernel,               # out 1x1 conv
        tfm.cvt_layers.layers[3].layers[1].kernel,   # head
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    def loss_fn(v, x):
        out = ours.apply(v, x)  # eval mode: running BN stats, like TF
        return jnp.mean(out ** 2)

    jg_v, jg_img = jax.grad(loss_fn, argnums=(0, 1))(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(img))
    p = jg_v["params"]
    jax_gs = [
        p["s1_emb"]["kernel"],
        p["s1_transformer"]["attn_0"]["to_q"]["depthwise"]["kernel"],
        p["s1_transformer"]["attn_0"]["to_kv"]["pointwise"]["kernel"],
        p["s1_transformer"]["attn_0"]["to_out"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_deepvit_grad_parity(tf):
    """Re-attention: the learned heads×heads mix of the post-softmax
    attention matrix and its LayerNorm-over-heads (reference
    deepvit.py:57-63, 82-84) — gradients through a materialized attention
    matrix transform."""
    import deepvit as ref

    from vit_tpu.models.deepvit import DeepViT

    cfg = dict(image_size=48, patch_size=16, num_classes=21,
               dim=64, depth=2, heads=4, mlp_dim=128, dim_head=16)
    img = np.random.RandomState(26).randn(2, 48, 48, 3).astype(np.float32)

    tfm = ref.DeepViT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = DeepViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_deepvit(tfm, variables)

    attn0 = tfm.transformer.layers[0][0].fn
    tf_vars = [
        tfm.patch_embedding.layers[1].kernel,
        attn0.reattn_weights,                  # the head mix itself
        attn0.reattn_norm.layers[1].gamma,     # LN over heads
        attn0.to_qkv.kernel,
        tfm.mlp_head.layers[1].kernel,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["patch_embedding"]["kernel"],
        p["attn_0"]["reattn_weights"],
        p["attn_0"]["reattn_norm"]["scale"],
        p["attn_0"]["to_qkv"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_parallel_vit_grad_parity(tf):
    """Summed parallel attention/MLP branches (reference
    parallel_vit.py:36-42): each branch must receive its own gradient."""
    import parallel_vit as ref

    from vit_tpu.models import parallel_vit

    cfg = dict(image_size=48, patch_size=16, num_classes=12, dim=64,
               depth=2, heads=2, mlp_dim=128, num_parallel_branches=2,
               dim_head=32)
    img = np.random.RandomState(27).randn(2, 48, 48, 3).astype(np.float32)

    tfm = ref.ViT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = parallel_vit.ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_parallel_vit(tfm, variables)

    par_attn0, par_mlp0 = tfm.transformer.layers[0]
    tf_vars = [
        tfm.pos_embedding,
        par_attn0.fns[0].fn.to_qkv.kernel,      # branch 0
        par_attn0.fns[1].fn.to_qkv.kernel,      # branch 1
        par_mlp0.fns[1].fn.net.layers[0].kernel,
        tfm.mlp_head.layers[1].kernel,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["pos_embedding"],
        p["attn_0_0"]["to_qkv"]["kernel"],
        p["attn_0_1"]["to_qkv"]["kernel"],
        p["mlp_0_1"]["fc1"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_efficient_vit_grad_parity(tf):
    """The injectable-encoder shell (reference efficient.py:13-55):
    gradients flow through the injected Transformer object."""
    import efficient as ref
    import vit as ref_vit

    from vit_tpu.layers.common import Transformer
    from vit_tpu.models import efficient

    img = np.random.RandomState(28).randn(2, 48, 48, 3).astype(np.float32)
    tf_encoder = ref_vit.Transformer(dim=64, depth=2, heads=2,
                                     dim_head=32, mlp_dim=128)
    tfm = ref.ViT(image_size=48, patch_size=16, num_classes=9, dim=64,
                  transformer=tf_encoder)
    tfm(tf.constant(img), training=False)  # build

    encoder = Transformer(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128)
    ours = efficient.ViT(image_size=48, patch_size=16, num_classes=9,
                         dim=64, transformer=encoder)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_efficient_vit(tfm, variables)

    tf_vars = [
        tfm.patch_embedding.layers[1].kernel,
        tf_encoder.layers[0][0].fn.to_qkv.kernel,
        tf_encoder.layers[1][1].fn.net.layers[3].kernel,
        tfm.mlp_head.layers[1].kernel,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["patch_embedding"]["kernel"],
        p["transformer"]["attn_0"]["to_qkv"]["kernel"],
        p["transformer"]["mlp_1"]["fc2"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_small_dataset_vit_grad_parity(tf):
    """SPT (shifted-patch tokenization LN+Dense) and LSA (learnable
    log-temperature + diagonal self-mask, reference
    vit_for_small_dataset.py:88-121): the temperature gradient is the
    interesting leaf — it only exists if the masked softmax backward
    matches."""
    import vit_for_small_dataset as ref

    from vit_tpu.models import vit_for_small_dataset

    cfg = dict(image_size=48, patch_size=16, num_classes=19,
               dim=64, depth=2, heads=4, mlp_dim=128, dim_head=16)
    img = np.random.RandomState(29).randn(2, 48, 48, 3).astype(np.float32)

    tfm = ref.ViT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = vit_for_small_dataset.ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_small_dataset_vit(tfm, variables)

    attn0 = tfm.transformer.layers[0][0].fn
    tf_vars = [
        tfm.patch_embedding.to_patch_tokens.layers[2].kernel,  # SPT Dense
        attn0.temperature,                                     # LSA temp
        attn0.to_qkv.kernel,
        tfm.mlp_head.layers[1].kernel,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["patch_embedding"]["proj"]["kernel"],
        p["attn_0"]["temperature"],
        p["attn_0"]["to_qkv"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_patch_merger_vit_grad_parity(tf):
    """PatchMerger learned-query cross-attention token reduction (reference
    vit_with_patch_merger.py:42-55): gradients into the merger queries and
    through the token-count discontinuity."""
    import vit_with_patch_merger as ref

    from vit_tpu.models import vit_with_patch_merger

    cfg = dict(image_size=48, patch_size=16, num_classes=23, dim=64,
               depth=4, heads=4, mlp_dim=128, patch_merge_layer=2,
               patch_merge_num_tokens=4, dim_head=16)
    img = np.random.RandomState(30).randn(2, 48, 48, 3).astype(np.float32)

    tfm = ref.ViT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = vit_with_patch_merger.ViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_patch_merger_vit(tfm, variables)

    tr = tfm.transformer
    tf_vars = [
        tfm.patch_embedding.layers[1].kernel,
        tr.patch_merger.queries,
        tr.patch_merger.norm.gamma,
        tr.layers[3][0].fn.to_qkv.kernel,   # post-merge layer
        tfm.mlp_head.layers[2].kernel,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["patch_embedding"]["kernel"],
        p["patch_merger"]["queries"],
        p["patch_merger"]["norm"]["scale"],
        p["attn_3"]["to_qkv"]["kernel"],
        p["head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_cct_grad_parity(tf):
    """Conv tokenizer + seq-pool attention head (reference cct.py:176-215,
    293-299), DropPath inactive in eval: gradients through the
    attention-pool softmax weighting."""
    import cct as ref

    from vit_tpu.models import cct as ours_mod

    # Keras 3 rejects uppercase padding in MaxPool2D (cct.py:200).
    real = tf.keras.layers.MaxPool2D

    def MaxPool2D(pool_size=(2, 2), strides=None, padding="valid", **kw):
        if isinstance(padding, str):
            padding = padding.lower()
        return real(pool_size=pool_size, strides=strides, padding=padding,
                    **kw)

    ref.nn.MaxPool2D = MaxPool2D

    cfg = dict(img_size=64, embedding_dim=64, n_conv_layers=2, kernel_size=3,
               stride=1, num_layers=2, num_heads=2, mlp_ratio=1.0,
               num_classes=13, positional_embedding="learnable")
    img = np.random.RandomState(31).randn(2, 64, 64, 3).astype(np.float32)

    tfm = ref.CCT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = ours_mod.CCT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cct(tfm, variables)

    clf = tfm.classifier
    conv0 = next(l for l in tfm.tokenizer.conv_layers.layers
                 if hasattr(l, "kernel"))
    tf_vars = [
        conv0.kernel,                                 # tokenizer conv
        clf.positional_emb,                           # learnable pos-emb
        clf.attention_pool.kernel,                    # seq-pool head
        clf.blocks.layers[0].self_attn.to_qkv.kernel,
        clf.fc.kernel,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["conv_0"]["kernel"],
        p["positional_emb"],
        p["attention_pool"]["kernel"],
        p["block_0"]["self_attn"]["to_qkv"]["kernel"],
        p["fc"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)


def test_cross_vit_grad_parity(tf):
    """Bidirectional CLS↔patch cross-attention with dim projection in/out
    (reference cross_vit.py:118-163): gradients into both branch encoders,
    the projection Denses and both heads.  Keras-3 patches as in
    test_cross_vit_parity (kv_include_self routed via context presence)."""
    import cross_vit as ref

    from vit_tpu.models import cross_vit

    _orig_attn_call = ref.Attention.call

    def _attn_call(self, x, context=None, kv_include_self=False,
                   training=True):
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
    img = np.random.RandomState(32).randn(2, 48, 48, 3).astype(np.float32)

    tfm = ref.CrossViT(**cfg)
    tfm(tf.constant(img), training=False)  # build
    ours = cross_vit.CrossViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_cross_vit(tfm, variables)

    sm_enc0, lg_enc0, cross0 = tfm.multi_scale_encoder.layers[0]
    sm_attend_lg = cross0.layers[0][0]
    tf_vars = [
        tfm.sm_image_embedder.patch_embedding.layers[1].kernel,
        sm_enc0.layers[0][0].fn.to_q.kernel,     # sm branch encoder
        sm_attend_lg.project_in.kernel,          # dim projection
        sm_attend_lg.fn.fn.to_q.kernel,          # cross-attention q
        tfm.sm_mlp_head.layers[1].kernel,
        tfm.lg_mlp_head.layers[1].kernel,
    ]
    tf_gs = _tf_grads(tf, tfm, img, tf_vars)

    jg_v, jg_img = _jax_grads(ours, variables, img)
    p = jg_v["params"]
    jax_gs = [
        p["sm_image_embedder"]["patch_embedding"]["kernel"],
        p["sm_enc_0"]["attn_0"]["to_q"]["kernel"],
        p["cross_attend_0"]["sm_project_in_0"]["kernel"],
        p["cross_attend_0"]["sm_attend_lg_0"]["to_q"]["kernel"],
        p["sm_head"]["kernel"],
        p["lg_head"]["kernel"],
    ]
    np.testing.assert_allclose(np.asarray(jg_img), np.asarray(tf_gs[0]),
                               atol=2e-5, rtol=1e-3)
    for jg, tg in zip(jax_gs, tf_gs[1:]):
        np.testing.assert_allclose(np.asarray(jg), np.asarray(tg),
                                   atol=2e-5, rtol=1e-3)
