"""Twins-SVT fused windowed-attention + conv-MLP paths vs the exact XLA
path (Pallas interpreter on CPU; on-chip wins in benchmarks/)."""

import jax
import jax.numpy as jnp

from vit_tpu.models.twins_svt import TwinsSVT


def _tiny(**over):
    kw = dict(num_classes=11,
              s1_emb_dim=32, s1_patch_size=4, s1_local_patch_size=7,
              s1_global_k=7, s1_depth=1,
              s2_emb_dim=48, s2_patch_size=2, s2_local_patch_size=7,
              s2_global_k=7, s2_depth=1,
              s3_emb_dim=64, s3_patch_size=1, s3_local_patch_size=7,
              s3_global_k=7, s3_depth=1,
              s4_emb_dim=80, s4_patch_size=1, s4_global_k=7, s4_depth=1)
    kw.update(over)
    return TwinsSVT(**kw)


def test_fused_paths_match_exact():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    ref = _tiny(fused_attention="never", fused_mlp="never")
    fused = _tiny(fused_attention="interpret", fused_mlp="interpret")

    params = ref.init(jax.random.PRNGKey(1), x)
    params_f = fused.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)

    y_ref = ref.apply(params, x)
    y_fused = fused.apply(params, x)
    assert jnp.max(jnp.abs(y_ref - y_fused)) < 1e-4

    g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(ref.apply(p, x))))(params)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.sin(fused.apply(p, x))))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        assert jnp.max(jnp.abs(a - b)) < 1e-3
