"""Shape/jit tests for the dense-token family (usage-block configs from the
reference file footers, scaled down)."""

import jax
import jax.numpy as jnp

from vit_tpu.layers.common import Transformer
from vit_tpu.models import cait, deepvit, efficient, parallel_vit


def _fwd(model, img_shape, key=0):
    img = jax.random.normal(jax.random.PRNGKey(key), img_shape)
    params = model.init(jax.random.PRNGKey(0), img)
    return model.apply(params, img), params, img


def test_deepvit_shape():
    m = deepvit.DeepViT(image_size=64, patch_size=16, num_classes=13,
                        dim=64, depth=2, heads=4, mlp_dim=128, dim_head=16)
    out, _, _ = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 13)
    assert jnp.all(jnp.isfinite(out))


def test_cait_shape():
    m = cait.CaiT(image_size=64, patch_size=16, num_classes=9, dim=64,
                  depth=2, cls_depth=1, heads=2, mlp_dim=128, dim_head=32)
    out, _, _ = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 9)
    assert jnp.all(jnp.isfinite(out))


def test_cait_layer_dropout_training():
    m = cait.CaiT(image_size=32, patch_size=8, num_classes=5, dim=32,
                  depth=3, cls_depth=1, heads=2, mlp_dim=64, dim_head=16,
                  layer_dropout=0.9)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    # Inference is deterministic regardless of layer_dropout (divergence from
    # the reference's always-on host RNG, SURVEY.md §8.10 — paper-correct).
    o1 = m.apply(params, img)
    o2 = m.apply(params, img)
    assert jnp.allclose(o1, o2)
    # Training drops layers stochastically but stays finite; over several
    # keys at least one draw must differ from the deterministic forward.
    outs = []
    for k in range(6):
        tk = m.apply(params, img, training=True,
                     rngs={"dropout": jax.random.PRNGKey(k)})
        assert jnp.all(jnp.isfinite(tk))
        outs.append(tk)
    assert any(not jnp.allclose(o1, tk) for tk in outs)


def test_parallel_vit_shape():
    m = parallel_vit.ViT(image_size=64, patch_size=16, num_classes=8,
                         dim=64, depth=2, heads=2, mlp_dim=128,
                         num_parallel_branches=3, dim_head=32)
    out, _, _ = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 8)


def test_efficient_vit_injectable_transformer():
    encoder = Transformer(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128)
    m = efficient.ViT(image_size=64, patch_size=16, num_classes=6,
                      dim=64, transformer=encoder)
    out, _, _ = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 6)
