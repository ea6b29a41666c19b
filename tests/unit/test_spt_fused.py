"""The one-conv SPT rewrite computes the identical tokenizer.

`SPT` (shifted patch tokenization, reference vit_for_small_dataset.py:
142-157) eagerly materializes the 5-way shifted channel concat,
patchifies it and LayerNorms 5c·p² features per token.  `_spt_conv`
computes `Dense(LN(patchify(concat)))` as one stride-p conv over the raw
image (γ·Dense rows scatter-added at each shift's offset) plus a
per-patch affine correction from a tap-multiplicity stats conv.  These
tests pin the rewrite elementwise against the eager path — forward and
every gradient — including the image-boundary rows where the shifts'
zero-fill must coincide with the conv's (1, 1) zero pad.
"""

import jax
import jax.numpy as jnp
import pytest

from vit_tpu.models.vit_for_small_dataset import SPT, ViT


@pytest.mark.parametrize("hw,p,c", [(32, 8, 3), (24, 4, 5), (16, 16, 3)])
def test_spt_conv_matches_eager(hw, p, c, monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, c))
    m = SPT(dim=48, patch_size=p, channels=c)

    monkeypatch.setenv("VIT_TPU_FUSED_SPT", "0")
    params = m.init(jax.random.PRNGKey(0), x)
    out_eager = m.apply(params, x)
    monkeypatch.setenv("VIT_TPU_FUSED_SPT", "1")
    params_fused = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_fused)
    out_fused = m.apply(params, x)

    assert out_fused.shape == out_eager.shape
    assert float(jnp.max(jnp.abs(out_fused - out_eager))) < 1e-4


def test_spt_conv_grads_match_eager(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    m = SPT(dim=32, patch_size=8)
    monkeypatch.setenv("VIT_TPU_FUSED_SPT", "0")
    params = m.init(jax.random.PRNGKey(0), x)

    def grads(flag):
        monkeypatch.setenv("VIT_TPU_FUSED_SPT", flag)
        return jax.grad(
            lambda p: jnp.sum(jnp.sin(m.apply(p, x))))(params)

    g0, g1 = grads("0"), grads("1")
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    for (path, a), b in zip(flat0, jax.tree.leaves(g1)):
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert err / scale < 1e-3, \
            f"{jax.tree_util.keystr(path)}: rel {err / scale}"


def test_full_model_spt_flag_invariant(monkeypatch):
    """Model-level pin: logits identical with the tokenizer fused or
    eager (f32, CPU)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    m = ViT(image_size=32, patch_size=8, num_classes=7, dim=64, depth=1,
            heads=2, dim_head=16, mlp_dim=96, fused_attention="never",
            fused_mlp="never")
    monkeypatch.setenv("VIT_TPU_FUSED_SPT", "0")
    params = m.init(jax.random.PRNGKey(0), x)
    y0 = m.apply(params, x)
    monkeypatch.setenv("VIT_TPU_FUSED_SPT", "1")
    y1 = m.apply(params, x)
    assert float(jnp.max(jnp.abs(y0 - y1))) < 1e-4
