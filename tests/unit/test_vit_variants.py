"""Shape/jit tests: SPT/LSA ViT, ViT+PatchMerger, CrossViT."""

import jax
import jax.numpy as jnp

from vit_tpu.models import cross_vit, vit_for_small_dataset, vit_with_patch_merger


def _fwd(model, img_shape, key=0):
    img = jax.random.normal(jax.random.PRNGKey(key), img_shape)
    params = model.init(jax.random.PRNGKey(0), img)
    return model.apply(params, img)


def test_small_dataset_vit_shape():
    m = vit_for_small_dataset.ViT(
        image_size=64, patch_size=16, num_classes=12,
        dim=64, depth=2, heads=4, mlp_dim=128, dim_head=16)
    out = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 12)
    assert jnp.all(jnp.isfinite(out))


def test_spt_standalone():
    # SPT is a public module (reference README.md:860-875): (4,64,64,3) with
    # patch 16 -> (4, 16, dim).
    spt = vit_for_small_dataset.SPT(dim=96, patch_size=16)
    img = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    params = spt.init(jax.random.PRNGKey(1), img)
    tokens = spt.apply(params, img)
    assert tokens.shape == (4, 16, 96)


def test_patch_merger_vit_shape():
    m = vit_with_patch_merger.ViT(
        image_size=64, patch_size=16, num_classes=11, dim=64, depth=4,
        heads=4, mlp_dim=128, patch_merge_layer=2, patch_merge_num_tokens=4,
        dim_head=16)
    out = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 11)


def test_patch_merger_standalone():
    # PatchMerger is a public module (reference README.md:815-829).
    merger = vit_with_patch_merger.PatchMerger(dim=64, num_tokens_out=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 256, 64))
    params = merger.init(jax.random.PRNGKey(1), x)
    out = merger.apply(params, x)
    assert out.shape == (4, 8, 64)


def test_cross_vit_shape():
    m = cross_vit.CrossViT(
        image_size=64, num_classes=17, sm_dim=48, lg_dim=64,
        sm_patch_size=8, lg_patch_size=16, sm_enc_depth=1, lg_enc_depth=1,
        sm_enc_mlp_dim=96, lg_enc_mlp_dim=128, cross_attn_depth=1,
        depth=2, dropout=0.0, emb_dropout=0.0)
    out = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 17)
    assert jnp.all(jnp.isfinite(out))
