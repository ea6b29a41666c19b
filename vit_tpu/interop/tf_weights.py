"""TF→JAX weight transplant utilities.

Moves trained weights from the TF/Keras reference models (built from
/root/reference/vit_tensorflow) into vit-tpu param pytrees — the mechanism
behind the golden parity suite (SURVEY.md §4: "transplant weights from the TF
reference into the JAX model per variant and assert logits within 1e-4").

Conventions line up with no transposes needed:
  Keras Dense kernel (in, out)   == flax Dense kernel (in, out)
  Keras Conv2D kernel (h,w,i,o)  == flax Conv kernel (h,w,i,o)
  Keras LayerNorm gamma/beta     == flax LayerNorm scale/bias
Depthwise convs differ: Keras groups-conv / DepthwiseConv2D kernels reshape
to flax's feature_group_count layout (see ``conv_groups_kernel``).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def t(x) -> np.ndarray:
    """TF variable/tensor → numpy."""
    return np.asarray(x)


def set_(params: dict, path: str, value) -> None:
    """Set ``params['a']['b']...`` by '/'-joined path, asserting the leaf
    exists and the shape matches (catches transplant drift early)."""
    keys = path.split("/")
    node = params
    for k in keys[:-1]:
        node = node[k]
    leaf = keys[-1]
    assert leaf in node, f"no param leaf {path!r}; have {list(node.keys())}"
    value = np.asarray(value)
    assert node[leaf].shape == value.shape, (
        f"shape mismatch at {path}: ours {node[leaf].shape} vs tf {value.shape}"
    )
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def dense(params: dict, prefix: str, tf_dense) -> None:
    set_(params, f"{prefix}/kernel", t(tf_dense.kernel))
    if getattr(tf_dense, "bias", None) is not None and tf_dense.use_bias:
        set_(params, f"{prefix}/bias", t(tf_dense.bias))


def layernorm(params: dict, prefix: str, tf_ln) -> None:
    set_(params, f"{prefix}/scale", t(tf_ln.gamma))
    set_(params, f"{prefix}/bias", t(tf_ln.beta))


def conv(params: dict, prefix: str, tf_conv) -> None:
    set_(params, f"{prefix}/kernel", t(tf_conv.kernel))
    if tf_conv.use_bias:
        set_(params, f"{prefix}/bias", t(tf_conv.bias))


def conv_groups_kernel(tf_kernel: np.ndarray, groups: int) -> np.ndarray:
    """Keras grouped-Conv2D kernel (h, w, cin/groups, cout) is already the
    layout flax uses for ``feature_group_count`` — identity, kept as a named
    hook in case of future layout divergence."""
    return t(tf_kernel)


def batchnorm(params: dict, batch_stats: dict, prefix: str, tf_bn) -> None:
    set_(params, f"{prefix}/scale", t(tf_bn.gamma))
    set_(params, f"{prefix}/bias", t(tf_bn.beta))
    set_(batch_stats, f"{prefix}/mean", t(tf_bn.moving_mean))
    set_(batch_stats, f"{prefix}/var", t(tf_bn.moving_variance))


def to_mutable(tree):
    """FrozenDict/dict pytree → nested plain dict of numpy arrays."""
    if hasattr(tree, "items"):
        return {k: to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


# ---------------------------------------------------------------------------
# Per-model transplants
# ---------------------------------------------------------------------------

def transplant_mlp(params, prefix, tf_mlp) -> None:
    """Reference MLP (vit.py:24-47): Sequential[Dense, GELU, Drop, Dense, Drop]."""
    dense(params, f"{prefix}/fc1", tf_mlp.net.layers[0])
    dense(params, f"{prefix}/fc2", tf_mlp.net.layers[3])


def transplant_attention(params, prefix, tf_attn) -> None:
    """Reference Attention (vit.py:49-85).  ``to_out`` may be an empty
    Sequential (or a substituted Identity under Keras 3) when the projection
    is skipped."""
    dense(params, f"{prefix}/to_qkv", tf_attn.to_qkv)
    sub = getattr(tf_attn.to_out, "layers", [])
    if len(sub) > 0:
        dense(params, f"{prefix}/to_out", sub[0])


def transplant_transformer(params, prefix, tf_tr) -> None:
    """Reference Transformer (vit.py:87-104): list of [PreNorm(Attn), PreNorm(MLP)]."""
    for i, (pre_attn, pre_mlp) in enumerate(tf_tr.layers):
        layernorm(params, f"{prefix}/attn_norm_{i}", pre_attn.norm)
        transplant_attention(params, f"{prefix}/attn_{i}", pre_attn.fn)
        layernorm(params, f"{prefix}/mlp_norm_{i}", pre_mlp.norm)
        transplant_mlp(params, f"{prefix}/mlp_{i}", pre_mlp.fn)


def transplant_vit(tf_model, variables) -> dict:
    """TF reference ViT (vit.py:106-177) → vit_tpu.models.vit.ViT variables."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    transplant_transformer(p, "transformer", tf_model.transformer)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


def transplant_deepvit(tf_model, variables) -> dict:
    """TF reference DeepViT (deepvit.py:112-157) → vit_tpu DeepViT variables."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    for i, (pre_attn, pre_mlp) in enumerate(tf_model.transformer.layers):
        layernorm(p, f"attn_norm_{i}", pre_attn.norm)
        a = pre_attn.fn
        dense(p, f"attn_{i}/to_qkv", a.to_qkv)
        set_(p, f"attn_{i}/reattn_weights", t(a.reattn_weights))
        layernorm(p, f"attn_{i}/reattn_norm", a.reattn_norm.layers[1])
        dense(p, f"attn_{i}/to_out", a.to_out.layers[0])
        layernorm(p, f"mlp_norm_{i}", pre_mlp.norm)
        transplant_mlp(p, f"mlp_{i}", pre_mlp.fn)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


def _transplant_cait_transformer(p, prefix, tf_tr) -> None:
    """Reference cait.py Transformer: [LayerScale(PreNorm(Attn)),
    LayerScale(PreNorm(MLP))] per depth."""
    for i, (ls_attn, ls_mlp) in enumerate(tf_tr.layers):
        set_(p, f"{prefix}/layerscale_attn_{i}", t(ls_attn.scale))
        set_(p, f"{prefix}/layerscale_mlp_{i}", t(ls_mlp.scale))
        pre_attn, pre_mlp = ls_attn.fn, ls_mlp.fn
        layernorm(p, f"{prefix}/attn_norm_{i}", pre_attn.norm)
        a = pre_attn.fn
        dense(p, f"{prefix}/attn_{i}/to_q", a.to_q)
        dense(p, f"{prefix}/attn_{i}/to_kv", a.to_kv)
        set_(p, f"{prefix}/attn_{i}/mix_heads_pre_attn", t(a.mix_heads_pre_attn))
        set_(p, f"{prefix}/attn_{i}/mix_heads_post_attn", t(a.mix_heads_post_attn))
        dense(p, f"{prefix}/attn_{i}/to_out", a.to_out.layers[0])
        layernorm(p, f"{prefix}/mlp_norm_{i}", pre_mlp.norm)
        transplant_mlp(p, f"{prefix}/mlp_{i}", pre_mlp.fn)


def transplant_cait(tf_model, variables) -> dict:
    """TF reference CaiT (cait.py:155-194) → vit_tpu CaiT variables."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    _transplant_cait_transformer(p, "patch_transformer", tf_model.patch_transformer)
    _transplant_cait_transformer(p, "cls_transformer", tf_model.cls_transformer)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


def transplant_parallel_vit(tf_model, variables) -> dict:
    """TF reference Parallel ViT (parallel_vit.py:119-178) → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    for i, (par_attn, par_mlp) in enumerate(tf_model.transformer.layers):
        for j, pre in enumerate(par_attn.fns):
            layernorm(p, f"attn_norm_{i}_{j}", pre.norm)
            a = pre.fn
            dense(p, f"attn_{i}_{j}/to_qkv", a.to_qkv)
            if hasattr(a.to_out, "layers") and len(a.to_out.layers) > 0:
                dense(p, f"attn_{i}_{j}/to_out", a.to_out.layers[0])
        for j, pre in enumerate(par_mlp.fns):
            layernorm(p, f"mlp_norm_{i}_{j}", pre.norm)
            transplant_mlp(p, f"mlp_{i}_{j}", pre.fn)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


def transplant_efficient_vit(tf_model, variables) -> dict:
    """TF reference "efficient" ViT shell (efficient.py:13-55) with a
    reference vit.Transformer injected → vit_tpu efficient.ViT with our
    Transformer injected."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    transplant_transformer(p, "transformer", tf_model.transformer)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


def transplant_small_dataset_vit(tf_model, variables) -> dict:
    """TF reference ViT-for-small-datasets (vit_for_small_dataset.py:159-215)
    → vit_tpu variables (SPT + LSA)."""
    v = to_mutable(variables)
    p = v["params"]
    spt = tf_model.patch_embedding
    layernorm(p, "patch_embedding/norm", spt.to_patch_tokens.layers[1])
    dense(p, "patch_embedding/proj", spt.to_patch_tokens.layers[2])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    for i, (pre_attn, pre_mlp) in enumerate(tf_model.transformer.layers):
        layernorm(p, f"attn_norm_{i}", pre_attn.norm)
        a = pre_attn.fn
        set_(p, f"attn_{i}/temperature", t(a.temperature))
        dense(p, f"attn_{i}/to_qkv", a.to_qkv)
        dense(p, f"attn_{i}/to_out", a.to_out.layers[0])
        layernorm(p, f"mlp_norm_{i}", pre_mlp.norm)
        transplant_mlp(p, f"mlp_{i}", pre_mlp.fn)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


def transplant_patch_merger_vit(tf_model, variables) -> dict:
    """TF reference ViT+PatchMerger (vit_with_patch_merger.py:136-184)
    → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    tr = tf_model.transformer
    layernorm(p, "patch_merger/norm", tr.patch_merger.norm)
    set_(p, "patch_merger/queries", t(tr.patch_merger.queries))
    for i, (pre_attn, pre_mlp) in enumerate(tr.layers):
        layernorm(p, f"attn_norm_{i}", pre_attn.norm)
        transplant_attention(p, f"attn_{i}", pre_attn.fn)
        layernorm(p, f"mlp_norm_{i}", pre_mlp.norm)
        transplant_mlp(p, f"mlp_{i}", pre_mlp.fn)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[1])
    dense(p, "head", tf_model.mlp_head.layers[2])
    return v


def _transplant_cross_attention(p, prefix, tf_attn) -> None:
    dense(p, f"{prefix}/to_q", tf_attn.to_q)
    dense(p, f"{prefix}/to_kv", tf_attn.to_kv)
    dense(p, f"{prefix}/to_out", tf_attn.to_out.layers[0])


def transplant_cross_vit(tf_model, variables) -> dict:
    """TF reference CrossViT (cross_vit.py:232-303) → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]
    for side, emb in (("sm", tf_model.sm_image_embedder),
                      ("lg", tf_model.lg_image_embedder)):
        dense(p, f"{side}_image_embedder/patch_embedding",
              emb.patch_embedding.layers[1])
        set_(p, f"{side}_image_embedder/cls_token", t(emb.cls_token))
        set_(p, f"{side}_image_embedder/pos_embedding", t(emb.pos_embedding))

    for r, (sm_enc, lg_enc, cross) in enumerate(tf_model.multi_scale_encoder.layers):
        for side, enc in (("sm", sm_enc), ("lg", lg_enc)):
            prefix = f"{side}_enc_{r}"
            for i, (pre_attn, pre_mlp) in enumerate(enc.layers):
                layernorm(p, f"{prefix}/attn_norm_{i}", pre_attn.norm)
                _transplant_cross_attention(p, f"{prefix}/attn_{i}", pre_attn.fn)
                layernorm(p, f"{prefix}/mlp_norm_{i}", pre_mlp.norm)
                transplant_mlp(p, f"{prefix}/mlp_{i}", pre_mlp.fn)
            layernorm(p, f"{prefix}/norm", enc.norm)
        cprefix = f"cross_attend_{r}"
        for i, (sm_attend_lg, lg_attend_sm) in enumerate(cross.layers):
            for tag, proj in (("sm_attend_lg", sm_attend_lg),
                              ("lg_attend_sm", lg_attend_sm)):
                side = tag.split("_")[0]
                if proj.need_projection:
                    dense(p, f"{cprefix}/{side}_project_in_{i}", proj.project_in)
                    dense(p, f"{cprefix}/{side}_project_out_{i}", proj.project_out)
                pre = proj.fn
                layernorm(p, f"{cprefix}/{tag}_norm_{i}", pre.norm)
                _transplant_cross_attention(p, f"{cprefix}/{tag}_{i}", pre.fn)

    layernorm(p, "sm_head_norm", tf_model.sm_mlp_head.layers[0])
    dense(p, "sm_head", tf_model.sm_mlp_head.layers[1])
    layernorm(p, "lg_head_norm", tf_model.lg_mlp_head.layers[0])
    dense(p, "lg_head", tf_model.lg_mlp_head.layers[1])
    return v


def transplant_t2t(tf_model, variables) -> dict:
    """TF reference T2TViT (t2t.py:49-109) → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]
    stages = tf_model.patch_embedding.layers
    for i, stage in enumerate(stages[:-1]):
        if not stage.is_last:
            transplant_transformer(p, f"t2t_transformer_{i}",
                                   stage.transformer_layer)
    dense(p, "patch_embedding", stages[-1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    transplant_transformer(p, "transformer", tf_model.transformer)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


def transplant_pit(tf_model, variables) -> dict:
    """TF reference PiT (pit.py:158-219) with the §8.4 pooling fix applied on
    the TF side → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    t_idx = pool_idx = 0
    for layer in tf_model.transformer_layers.layers:
        if not hasattr(layer, "downsample"):
            transplant_transformer(p, f"transformer_{t_idx}", layer)
            t_idx += 1
        else:  # Pool
            dense(p, f"pool_{pool_idx}/cls_ff", layer.cls_ff)
            conv(p, f"pool_{pool_idx}/downsample_grouped",
                 layer.downsample.net.layers[0])
            conv(p, f"pool_{pool_idx}/downsample_pointwise",
                 layer.downsample.net.layers[1])
            pool_idx += 1
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


def transplant_cct(tf_model, variables) -> dict:
    """TF reference CCT (cct.py:307-345) → vit_tpu CCT variables.
    Use positional_embedding='learnable' or 'none' on the TF side — the
    reference's 'sine' default crashes at construction (SURVEY.md §8.6)."""
    v = to_mutable(variables)
    p = v["params"]
    conv_idx = 0
    for layer in tf_model.tokenizer.conv_layers.layers:
        if hasattr(layer, "kernel"):
            conv(p, f"conv_{conv_idx}", layer)
            conv_idx += 1
    clf = tf_model.classifier
    if getattr(clf, "positional_emb", None) is not None and clf.positional_emb.trainable:
        set_(p, "positional_emb", t(clf.positional_emb))
    if not clf.seq_pool:
        set_(p, "class_emb", t(clf.class_emb))
    else:
        dense(p, "attention_pool", clf.attention_pool)
    for i, block in enumerate(clf.blocks.layers):
        layernorm(p, f"block_{i}/pre_norm", block.pre_norm)
        dense(p, f"block_{i}/self_attn/to_qkv", block.self_attn.to_qkv)
        dense(p, f"block_{i}/self_attn/proj", block.self_attn.proj.layers[0])
        layernorm(p, f"block_{i}/norm1", block.norm1)
        dense(p, f"block_{i}/linear1", block.linear1)
        dense(p, f"block_{i}/linear2", block.linear2)
    layernorm(p, "norm", clf.norm)
    dense(p, "fc", clf.fc)
    return v


def channel_layernorm(params: dict, prefix: str, tf_ln) -> None:
    """Reference channel LayerNorm (cvt.py:30-43): variables g, b."""
    set_(params, f"{prefix}/g", t(tf_ln.g))
    set_(params, f"{prefix}/b", t(tf_ln.b))


def embedding(params: dict, prefix: str, tf_emb) -> None:
    set_(params, f"{prefix}/embedding", t(tf_emb.embeddings))


def transplant_levit(tf_model, variables) -> dict:
    """TF reference LeViT (levit.py:164-226) → vit_tpu LeViT variables
    (params + batch_stats)."""
    v = to_mutable(variables)
    p, bs = v["params"], v["batch_stats"]

    for i, conv_layer in enumerate(tf_model.conv_embedding.layers):
        conv(p, f"conv_embedding_{i}", conv_layer)

    def do_attention(prefix, a):
        conv(p, f"{prefix}/to_q", a.to_q.layers[0])
        batchnorm(p, bs, f"{prefix}/to_q_bn", a.to_q.layers[1])
        conv(p, f"{prefix}/to_k", a.to_k.layers[0])
        batchnorm(p, bs, f"{prefix}/to_k_bn", a.to_k.layers[1])
        conv(p, f"{prefix}/to_v", a.to_v.layers[0])
        batchnorm(p, bs, f"{prefix}/to_v_bn", a.to_v.layers[1])
        conv(p, f"{prefix}/to_out", a.to_out.layers[1])
        batchnorm(p, bs, f"{prefix}/to_out_bn", a.to_out.layers[2])
        embedding(p, f"{prefix}/pos_bias", a.pos_bias)

    def do_transformer(prefix, tr):
        for i, (a, m) in enumerate(tr.layers):
            do_attention(f"{prefix}/attn_{i}", a)
            conv(p, f"{prefix}/mlp_{i}/fc1", m.net.layers[0])
            conv(p, f"{prefix}/mlp_{i}/fc2", m.net.layers[3])

    stage = shrink = 0
    for tr in tf_model.backbone.layers:
        if tr.layers and tr.layers[0][0].to_q.layers[0].strides[0] == 2:
            do_transformer(f"shrink_{shrink}", tr)
            shrink += 1
        else:
            do_transformer(f"stage_{stage}", tr)
            stage += 1

    dense(p, "mlp_head", tf_model.mlp_head)
    if hasattr(tf_model.distill_head, "kernel"):
        dense(p, "distill_head", tf_model.distill_head)
    return v


def transplant_cvt(tf_model, variables) -> dict:
    """TF reference CvT (cvt.py:149-202) → vit_tpu CvT variables."""
    v = to_mutable(variables)
    p, bs = v["params"], v["batch_stats"]

    def do_dwconv(prefix, dw):
        conv(p, f"{prefix}/depthwise", dw.net.layers[0])
        batchnorm(p, bs, f"{prefix}/bn", dw.net.layers[1])
        conv(p, f"{prefix}/pointwise", dw.net.layers[2])

    for si, prefix in enumerate(("s1", "s2", "s3")):
        stage_seq = tf_model.cvt_layers.layers[si]
        conv(p, f"{prefix}_emb", stage_seq.layers[0])
        channel_layernorm(p, f"{prefix}_norm", stage_seq.layers[1])
        tr = stage_seq.layers[2]
        tprefix = f"{prefix}_transformer"
        for i, (pre_attn, pre_mlp) in enumerate(tr.layers):
            channel_layernorm(p, f"{tprefix}/attn_norm_{i}", pre_attn.norm)
            a = pre_attn.fn
            do_dwconv(f"{tprefix}/attn_{i}/to_q", a.to_q)
            do_dwconv(f"{tprefix}/attn_{i}/to_kv", a.to_kv)
            conv(p, f"{tprefix}/attn_{i}/to_out", a.to_out.layers[0])
            channel_layernorm(p, f"{tprefix}/mlp_norm_{i}", pre_mlp.norm)
            conv(p, f"{tprefix}/mlp_fc1_{i}", pre_mlp.fn.net.layers[0])
            conv(p, f"{tprefix}/mlp_fc2_{i}", pre_mlp.fn.net.layers[3])

    head_seq = tf_model.cvt_layers.layers[3]
    dense(p, "head", head_seq.layers[1])
    return v


def transplant_twins_svt(tf_model, variables) -> dict:
    """TF reference TwinsSVT (twins_svt.py:215-268) → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]

    def do_attn(prefix, a):
        conv(p, f"{prefix}/to_q", a.to_q)
        conv(p, f"{prefix}/to_kv", a.to_kv)
        conv(p, f"{prefix}/to_out", a.to_out.layers[0])

    def do_mlp(prefix, m):
        conv(p, f"{prefix}/fc1", m.net.layers[0])
        conv(p, f"{prefix}/fc2", m.net.layers[3])

    def do_transformer(prefix, tr):
        for i, (local, ff1, global_, ff2) in enumerate(tr.layers):
            if hasattr(local, "fn"):  # Residual(PreNorm(...)), not Identity
                channel_layernorm(p, f"{prefix}/local_norm_{i}", local.fn.norm)
                do_attn(f"{prefix}/local_attn_{i}", local.fn.fn)
                channel_layernorm(p, f"{prefix}/ff1_norm_{i}", ff1.fn.norm)
                do_mlp(f"{prefix}/ff1_{i}", ff1.fn.fn)
            channel_layernorm(p, f"{prefix}/global_norm_{i}", global_.fn.norm)
            do_attn(f"{prefix}/global_attn_{i}", global_.fn.fn)
            channel_layernorm(p, f"{prefix}/ff2_norm_{i}", ff2.fn.norm)
            do_mlp(f"{prefix}/ff2_{i}", ff2.fn.fn)

    for si, prefix in enumerate(("s1", "s2", "s3", "s4")):
        stage = tf_model.svt_layers.layers[si]
        conv(p, f"{prefix}_embed/proj", stage.layers[0].proj)
        do_transformer(f"{prefix}_pre_transformer", stage.layers[1])
        conv(p, f"{prefix}_peg/proj", stage.layers[2].proj.fn)
        do_transformer(f"{prefix}_transformer", stage.layers[3])

    dense(p, "head", tf_model.svt_layers.layers[4].layers[1])
    return v


def transplant_crossformer(tf_model, variables) -> dict:
    """TF reference CrossFormer (crossformer.py:205-257) → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]

    def do_attn(prefix, a):
        channel_layernorm(p, f"{prefix}/norm", a.norm)
        conv(p, f"{prefix}/to_qkv", a.to_qkv)
        conv(p, f"{prefix}/to_out", a.to_out)
        dpb = a.dpb.dpb_layers.layers
        # Sequential: [Dense, LN, ReLU] ×3 then Dense(1), Rearrange
        for i in range(3):
            dense(p, f"{prefix}/dpb/fc{i}", dpb[i * 3])
            layernorm(p, f"{prefix}/dpb/norm{i}", dpb[i * 3 + 1])
        dense(p, f"{prefix}/dpb/out", dpb[9])

    def do_mlp(prefix, m):
        channel_layernorm(p, f"{prefix}/norm", m.net.layers[0])
        conv(p, f"{prefix}/fc1", m.net.layers[1])
        conv(p, f"{prefix}/fc2", m.net.layers[4])

    for s, (cel, tr) in enumerate(tf_model.crossformer_layers):
        for ci, c in enumerate(cel.convs):
            conv(p, f"cel_{s}/conv_{ci}", c)
        for i, (short_attn, short_ff, long_attn, long_ff) in enumerate(tr.layers):
            do_attn(f"short_attn_{s}_{i}", short_attn)
            do_mlp(f"short_ff_{s}_{i}", short_ff)
            do_attn(f"long_attn_{s}_{i}", long_attn)
            do_mlp(f"long_ff_{s}_{i}", long_ff)

    dense(p, "head", tf_model.to_logits.layers[1])
    return v


def transplant_regionvit(tf_model, variables) -> dict:
    """TF reference RegionViT (regionvit.py:184-263) → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]

    enc = tf_model.local_encoder
    if hasattr(enc, "layers"):  # tokenize_local_3_conv
        conv(p, "local_conv0", enc.layers[0])
        layernorm(p, "local_norm0", enc.layers[1])
        conv(p, "local_conv1", enc.layers[3])
        layernorm(p, "local_norm1", enc.layers[4])
        conv(p, "local_conv2", enc.layers[6])
    else:
        conv(p, "local_encoder", enc)
    conv(p, "region_encoder", tf_model.region_encoder.layers[1])

    for ind, (down, peg, tr) in enumerate(tf_model.region_layers):
        if hasattr(down, "conv"):
            conv(p, f"downsample_{ind}", down.conv)
        if hasattr(peg, "proj"):
            conv(p, f"peg_{ind}", peg.proj)
        tprefix = f"transformer_{ind}"
        embedding(p, f"{tprefix}/local_rel_pos_bias", tr.local_rel_pos_bias)
        for i, (attn, ff) in enumerate(tr.layers):
            layernorm(p, f"{tprefix}/attn_{i}/norm", attn.norm)
            dense(p, f"{tprefix}/attn_{i}/to_qkv", attn.to_qkv)
            dense(p, f"{tprefix}/attn_{i}/to_out", attn.to_out)
            layernorm(p, f"{tprefix}/ff_{i}/norm", ff.net.layers[0])
            dense(p, f"{tprefix}/ff_{i}/fc1", ff.net.layers[1])
            dense(p, f"{tprefix}/ff_{i}/fc2", ff.net.layers[4])

    layernorm(p, "head_norm", tf_model.to_logits.layers[1])
    dense(p, "head", tf_model.to_logits.layers[2])
    return v


def transplant_scalable_vit(tf_model, variables) -> dict:
    """TF reference ScalableViT (scalable_vit.py:250-319) → vit_tpu variables.
    Works with the §8.3-patched reference (paper block order)."""
    v = to_mutable(variables)
    p = v["params"]
    conv(p, "to_patches", tf_model.to_patches)

    def do_ssa(prefix, a):
        conv(p, f"{prefix}/to_q", a.to_q)
        conv(p, f"{prefix}/to_k", a.to_k)
        conv(p, f"{prefix}/to_v", a.to_v)
        conv(p, f"{prefix}/to_out", a.to_out.layers[0])

    def do_iwsa(prefix, a):
        conv(p, f"{prefix}/to_q", a.to_q)
        conv(p, f"{prefix}/to_k", a.to_k)
        conv(p, f"{prefix}/to_v", a.to_v)
        conv(p, f"{prefix}/local_interactive_module", a.local_interactive_module)
        conv(p, f"{prefix}/to_out", a.to_out.layers[0])

    def do_mlp(prefix, m):
        conv(p, f"{prefix}/fc1", m.net.layers[0])
        conv(p, f"{prefix}/fc2", m.net.layers[3])

    for s, (tr, down) in enumerate(tf_model.scalable_layers):
        sp = f"stage_{s}"
        for ind, (ssa, ff1, peg, ff2, iwsa) in enumerate(tr.layers):
            channel_layernorm(p, f"{sp}/ssa_norm_{ind}", ssa.norm)
            do_ssa(f"{sp}/ssa_{ind}", ssa.fn)
            channel_layernorm(p, f"{sp}/ff1_norm_{ind}", ff1.norm)
            do_mlp(f"{sp}/ff1_{ind}", ff1.fn)
            if peg is not None:
                conv(p, f"{sp}/peg", peg.proj)
            channel_layernorm(p, f"{sp}/iwsa_norm_{ind}", iwsa.norm)
            do_iwsa(f"{sp}/iwsa_{ind}", iwsa.fn)
            channel_layernorm(p, f"{sp}/ff2_norm_{ind}", ff2.norm)
            do_mlp(f"{sp}/ff2_{ind}", ff2.fn)
        channel_layernorm(p, f"{sp}/norm", tr.norm)
        if down is not None:
            conv(p, f"downsample_{s}", down.conv)

    layernorm(p, "head_norm", tf_model.mlp_head.layers[1])
    dense(p, "head", tf_model.mlp_head.layers[2])
    return v


def transplant_nest(tf_model, variables) -> dict:
    """TF reference NesT (nest.py:150-216) → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]
    conv(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    for idx, (tr, agg) in enumerate(tf_model.nest_layers):
        tprefix = f"transformer_{idx}"
        set_(p, f"{tprefix}/pos_emb", t(tr.pos_emb))
        for i, (pre_attn, pre_mlp) in enumerate(tr.layers):
            channel_layernorm(p, f"{tprefix}/attn_norm_{i}", pre_attn.norm)
            conv(p, f"{tprefix}/attn_{i}/to_qkv", pre_attn.fn.to_qkv)
            conv(p, f"{tprefix}/attn_{i}/to_out", pre_attn.fn.to_out.layers[0])
            channel_layernorm(p, f"{tprefix}/mlp_norm_{i}", pre_mlp.norm)
            conv(p, f"{tprefix}/mlp_fc1_{i}", pre_mlp.fn.net.layers[0])
            conv(p, f"{tprefix}/mlp_fc2_{i}", pre_mlp.fn.net.layers[3])
        if hasattr(agg, "ag_layers"):
            conv(p, f"aggregate_conv_{idx}", agg.ag_layers.layers[0])
            channel_layernorm(p, f"aggregate_norm_{idx}", agg.ag_layers.layers[1])
    channel_layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[2])
    return v


def transplant_mobile_vit(tf_model, variables) -> dict:
    """TF reference MobileViT (mobile_vit.py:209-271) → vit_tpu variables."""
    v = to_mutable(variables)
    p, bs = v["params"], v["batch_stats"]

    def do_conv_bn(prefix, cnb):
        conv(p, f"{prefix}/conv", cnb.layers.layers[0])
        batchnorm(p, bs, f"{prefix}/bn", cnb.layers.layers[1])

    def do_mv2(prefix, blk):
        seq = blk.conv.layers
        if len(seq) == 5:  # expansion == 1
            conv(p, f"{prefix}/dw", seq[0])
            batchnorm(p, bs, f"{prefix}/dw_bn", seq[1])
            conv(p, f"{prefix}/pw_linear", seq[3])
            batchnorm(p, bs, f"{prefix}/pw_linear_bn", seq[4])
        else:
            conv(p, f"{prefix}/pw", seq[0])
            batchnorm(p, bs, f"{prefix}/pw_bn", seq[1])
            conv(p, f"{prefix}/dw", seq[3])
            batchnorm(p, bs, f"{prefix}/dw_bn", seq[4])
            conv(p, f"{prefix}/pw_linear", seq[6])
            batchnorm(p, bs, f"{prefix}/pw_linear_bn", seq[7])

    do_conv_bn("conv1", tf_model.conv1)
    for i, blk in enumerate(tf_model.stem.layers):
        do_mv2(f"stem_{i}", blk)
    for i, (mv2, mvit) in enumerate(tf_model.trunk):
        do_mv2(f"trunk_conv_{i}", mv2)
        bprefix = f"trunk_attn_{i}"
        do_conv_bn(f"{bprefix}/conv1", mvit.conv1)
        do_conv_bn(f"{bprefix}/conv2", mvit.conv2)
        for j, (pre_attn, pre_mlp) in enumerate(mvit.transformer.layers):
            layernorm(p, f"{bprefix}/attn_norm_{j}", pre_attn.norm)
            dense(p, f"{bprefix}/attn_{j}/to_qkv", pre_attn.fn.to_qkv)
            dense(p, f"{bprefix}/attn_{j}/to_out", pre_attn.fn.to_out.layers[0])
            layernorm(p, f"{bprefix}/mlp_norm_{j}", pre_mlp.norm)
            dense(p, f"{bprefix}/mlp_fc1_{j}", pre_mlp.fn.net.layers[0])
            dense(p, f"{bprefix}/mlp_fc2_{j}", pre_mlp.fn.net.layers[3])
        do_conv_bn(f"{bprefix}/conv3", mvit.conv3)
        do_conv_bn(f"{bprefix}/conv4", mvit.conv4)
    do_conv_bn("to_logits_conv", tf_model.to_logits.layers[0])
    dense(p, "head", tf_model.to_logits.layers[2])
    return v


def transplant_ats_vit(tf_model, variables) -> dict:
    """TF reference ATS-ViT (ats_vit.py:260-318) → vit_tpu variables."""
    v = to_mutable(variables)
    p = v["params"]
    dense(p, "patch_embedding", tf_model.patch_embedding.layers[1])
    set_(p, "cls_token", t(tf_model.cls_token))
    set_(p, "pos_embedding", t(tf_model.pos_embedding))
    for i, (pre_attn, pre_mlp) in enumerate(tf_model.transformer.layers):
        layernorm(p, f"transformer/attn_norm_{i}", pre_attn.norm)
        a = pre_attn.fn
        dense(p, f"transformer/attn_{i}/to_qkv", a.to_qkv)
        dense(p, f"transformer/attn_{i}/to_out", a.to_out.layers[0])
        layernorm(p, f"transformer/mlp_norm_{i}", pre_mlp.norm)
        transplant_mlp(p, f"transformer/mlp_{i}", pre_mlp.fn)
    layernorm(p, "head_norm", tf_model.mlp_head.layers[0])
    dense(p, "head", tf_model.mlp_head.layers[1])
    return v


# ---------------------------------------------------------------------------
# One-call dispatch
# ---------------------------------------------------------------------------

_TRANSPLANTS = {
    "ViT": "transplant_vit",
    "DeepViT": "transplant_deepvit",
    "CaiT": "transplant_cait",
    "T2TViT": "transplant_t2t",
    "CCT": "transplant_cct",
    "CrossViT": "transplant_cross_vit",
    "PiT": "transplant_pit",
    "LeViT": "transplant_levit",
    "CvT": "transplant_cvt",
    "TwinsSVT": "transplant_twins_svt",
    "CrossFormer": "transplant_crossformer",
    "RegionViT": "transplant_regionvit",
    "ScalableViT": "transplant_scalable_vit",
    "NesT": "transplant_nest",
    "MobileViT": "transplant_mobile_vit",
}


def from_tensorflow(tf_model, variables, kind: str = None) -> dict:
    """Transplant a TF/Keras reference model's weights into vit-tpu
    ``variables`` in one call; dispatches on the TF class name (or pass
    ``kind`` explicitly for the ambiguous per-file ``ViT`` classes:
    'small_dataset' → SPT/LSA ViT, 'patch_merger', 'ats', 'parallel',
    'efficient')."""
    if kind is not None:
        special = {
            "small_dataset": transplant_small_dataset_vit,
            "patch_merger": transplant_patch_merger_vit,
            "ats": transplant_ats_vit,
            "parallel": transplant_parallel_vit,
            "efficient": transplant_efficient_vit,
        }
        if kind in special:
            return special[kind](tf_model, variables)
        return globals()[_TRANSPLANTS[kind]](tf_model, variables)
    name = type(tf_model).__name__
    assert name in _TRANSPLANTS, (
        f"no transplant registered for {name!r}; pass kind= for per-file "
        f"ViT classes (options: {sorted(_TRANSPLANTS)} + "
        "['small_dataset','patch_merger','ats','parallel','efficient'])"
    )
    return globals()[_TRANSPLANTS[name]](tf_model, variables)
