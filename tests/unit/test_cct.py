"""CCT unit tests: factories, pos-emb modes (incl. the fixed 'sine'
default, SURVEY.md §8.6), seq-pool, stochastic depth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.models.cct import CCT, cct_2, sinusoidal_embedding


def _fwd(model, img_shape, key=0, training=False, rngs=None):
    img = jax.random.normal(jax.random.PRNGKey(key), img_shape)
    params = model.init(jax.random.PRNGKey(0), img)
    return model.apply(params, img, training=training, rngs=rngs or {})


def test_cct_sine_default_works():
    # 'sine' is the reference default and crashes upstream (§8.6); here it
    # must work out of the box.
    m = CCT(img_size=64, embedding_dim=64, n_conv_layers=2, kernel_size=3,
            stride=1, num_layers=2, num_heads=2, mlp_ratio=1.0, num_classes=10)
    out = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 10)
    assert jnp.all(jnp.isfinite(out))


def test_cct_learnable_and_none():
    for mode in ("learnable", "none"):
        m = CCT(img_size=64, embedding_dim=64, n_conv_layers=1, kernel_size=7,
                stride=2, num_layers=1, num_heads=2, mlp_ratio=1.0,
                num_classes=7, positional_embedding=mode)
        out = _fwd(m, (2, 64, 64, 3))
        assert out.shape == (2, 7)


def test_cct_factory_and_legacy_kwargs():
    with pytest.warns(UserWarning, match="legacy kwarg"):
        m = cct_2(img_size=64, num_classes=5, padding=3, pooling_padding=1,
                  positional_embedding="learnable")
    out = _fwd(m, (1, 64, 64, 3))
    assert out.shape == (1, 5)


def test_cct_sequence_length_analytic():
    m = CCT(img_size=224, n_conv_layers=2, kernel_size=7, stride=2,
            pooling_stride=2)
    # 224 -> conv s2 -> 112 -> pool s2 -> 56 -> conv s2 -> 28 -> pool -> 14
    assert m.sequence_length(3, 224, 224) == 14 * 14


def test_sinusoidal_embedding_values():
    pe = sinusoidal_embedding(4, 6)[0]
    assert pe.shape == (4, 6)
    np.testing.assert_allclose(pe[0, 0], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1], 1.0, atol=1e-7)  # cos(0)
    np.testing.assert_allclose(pe[2, 0], np.sin(2.0), atol=1e-6)
    np.testing.assert_allclose(pe[2, 1], np.cos(2.0), atol=1e-6)


def test_cct_stochastic_depth_training():
    m = CCT(img_size=32, embedding_dim=32, n_conv_layers=1, num_layers=3,
            num_heads=2, mlp_ratio=1.0, num_classes=4,
            positional_embedding="learnable", stochastic_depth_rate=0.8,
            attention_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    o1 = m.apply(params, img)
    o2 = m.apply(params, img)
    assert jnp.allclose(o1, o2)  # deterministic inference
    outs = [m.apply(params, img, training=True,
                    rngs={"dropout": jax.random.PRNGKey(k)}) for k in range(5)]
    assert any(not jnp.allclose(o1, o) for o in outs)
