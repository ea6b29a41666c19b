"""Shape/jit tests: T2T-ViT, PiT."""

import jax
import jax.numpy as jnp

from vit_tpu.models import pit, t2t
from vit_tpu.ops.patchify import extract_patches


def _fwd(model, img_shape, key=0):
    img = jax.random.normal(jax.random.PRNGKey(key), img_shape)
    params = model.init(jax.random.PRNGKey(0), img)
    return model.apply(params, img)


def test_extract_patches_matches_tf_semantics():
    # Checked against tf.image.extract_patches in the parity suite; here just
    # shape/order invariants: kernel 3 stride 2 SAME on 8x8 -> 4x4 positions,
    # channel dim = k*k*c.
    img = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    out = extract_patches(img, 3, 2, padding="SAME")
    assert out.shape == (2, 4, 4, 27)
    out_v = extract_patches(img, 3, 2, padding="VALID")
    assert out_v.shape == (2, 3, 3, 27)
    # centre patch of VALID equals raw window
    win = img[0, 2:5, 2:5, :].reshape(-1)
    assert jnp.allclose(out_v[0, 1, 1], win)


def test_t2t_shape():
    m = t2t.T2TViT(image_size=64, num_classes=10, dim=64, depth=2, heads=2,
                   mlp_dim=128, t2t_layers=((3, 2), (3, 2)))
    out = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 10)
    assert jnp.all(jnp.isfinite(out))


def test_pit_shape_and_pooling():
    m = pit.PiT(image_size=64, patch_size=8, num_classes=7, dim=32,
                depth=(1, 1, 1), heads=2, mlp_dim=64, dim_head=16)
    out = _fwd(m, (2, 64, 64, 3))
    assert out.shape == (2, 7)
    # dim doubling: final head norm operates on dim*4
    img = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    assert params["params"]["head_norm"]["scale"].shape == (128,)
