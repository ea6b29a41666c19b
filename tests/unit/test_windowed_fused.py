"""Fused windowed-attention / conv-MLP paths of the hierarchical models
(CrossFormer incl. its DPB bias, NesT, RegionViT incl. its per-head
rel-pos bias) vs the exact XLA paths — Pallas interpreter on CPU.

Twins-SVT has its own file (test_twins_fused.py); on-chip wins are
recorded in benchmarks/."""

import jax
import jax.numpy as jnp
import pytest

from vit_tpu.models.crossformer import CrossFormer
from vit_tpu.models.nest import NesT
from vit_tpu.models.regionvit import RegionViT


def _check(make, x, grad_tol=1e-3):
    ref = make("never")
    fused = make("interpret")
    params = ref.init(jax.random.PRNGKey(1), x)
    params_f = fused.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)

    y_ref = ref.apply(params, x)
    y_fused = fused.apply(params, x)
    assert jnp.max(jnp.abs(y_ref - y_fused)) < 1e-4

    g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(ref.apply(p, x))))(params)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.sin(fused.apply(p, x))))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = jax.tree.leaves(g_fused)
    for (path, a), b in zip(flat_r, flat_f):
        err = jnp.max(jnp.abs(a - b))
        assert err < grad_tol, f"{jax.tree_util.keystr(path)}: {err}"


def test_crossformer_fused_matches_exact():
    def make(mode):
        return CrossFormer(num_classes=6, dim=(32, 64, 96, 128),
                           depth=(1, 1, 1, 1), global_window_size=(4, 2, 2, 1),
                           local_window_size=4,
                           cross_embed_kernel_sizes=((2, 4),) * 4,
                           cross_embed_strides=(4, 2, 2, 2),
                           fused_attention=mode, fused_mlp=mode)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 3))
    _check(make, x)


def test_nest_fused_matches_exact():
    def make(mode):
        return NesT(image_size=64, patch_size=4, num_classes=12, dim=32,
                    heads=2, num_hierarchies=3, block_repeats=(1, 1, 1),
                    fused_attention=mode, fused_mlp=mode)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    _check(make, x)


def test_regionvit_fused_matches_exact():
    def make(mode):
        return RegionViT(dim=(32, 48, 64, 96), depth=(1, 1, 1, 1),
                         window_size=4, num_classes=8, local_patch_size=4,
                         fused_attention=mode)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 3))
    _check(make, x)
