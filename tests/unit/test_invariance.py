"""Transform invariances (SURVEY.md §4): batched == vmapped, jit == eager,
bf16 policy sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ViT


def _model(dtype=jnp.float32):
    return ViT(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
               heads=2, mlp_dim=64, dim_head=16, dtype=dtype)


def test_vmap_matches_batched():
    m = _model()
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)
    batched = m.apply(params, imgs)
    vmapped = jax.vmap(lambda x: m.apply(params, x[None])[0])(imgs)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(vmapped),
                               atol=1e-5)


def test_bf16_policy_params_stay_f32():
    m = _model(dtype=jnp.bfloat16)
    img = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), img)
    # params stay f32 (master weights); compute in bf16
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
    out = m.apply(params, img)
    assert out.dtype == jnp.bfloat16


def test_bf16_close_to_f32():
    m32, m16 = _model(jnp.float32), _model(jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = m32.init(jax.random.PRNGKey(0), img)
    o32 = m32.apply(params, img)
    o16 = m16.apply(params, img.astype(jnp.bfloat16)).astype(jnp.float32)
    # loose tolerance: bf16 has ~3 significant decimal digits
    np.testing.assert_allclose(np.asarray(o32), np.asarray(o16), atol=0.3)


def test_deterministic_prng_bitwise_reproducible():
    # same key ⇒ bitwise-same loss (SURVEY.md §5 determinism hygiene)
    from vit_tpu.objectives import MAE

    mae = MAE(image_size=32, encoder=_model(), decoder_dim=16)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = mae.init({"params": jax.random.PRNGKey(0)}, img)
    l1 = mae.apply(params, img, rngs={"mask": jax.random.PRNGKey(3)})
    l2 = mae.apply(params, img, rngs={"mask": jax.random.PRNGKey(3)})
    assert float(l1) == float(l2)
