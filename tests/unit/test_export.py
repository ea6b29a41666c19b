"""Serving export round-trip: StableHLO artifact == live model forward."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ViT
from vit_tpu.interop.export import (export_forward, load_forward,
                                    load_forward_file, save_forward)


def _model_and_vars():
    model = ViT(image_size=32, patch_size=8, num_classes=5,
                dim=32, depth=2, heads=2, mlp_dim=64, dim_head=16)
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    return model, variables


def test_export_roundtrip_with_variables():
    model, variables = _model_and_vars()
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    data = export_forward(model, variables, (2, 32, 32, 3))
    assert isinstance(data, bytes) and len(data) > 0

    served = load_forward(data)
    np.testing.assert_allclose(
        np.asarray(served(variables, img)),
        np.asarray(model.apply(variables, img)),
        atol=1e-6, rtol=1e-6)


def test_export_roundtrip_baked_params(tmp_path):
    model, variables = _model_and_vars()
    img = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))

    path = os.path.join(tmp_path, "vit.stablehlo")
    save_forward(path, model, variables, (2, 32, 32, 3), bake_params=True)

    served = load_forward_file(path)
    np.testing.assert_allclose(
        np.asarray(served(img)),
        np.asarray(model.apply(variables, img)),
        atol=1e-6, rtol=1e-6)


def test_export_rejects_other_shapes():
    model, variables = _model_and_vars()
    data = export_forward(model, variables, (2, 32, 32, 3))
    served = load_forward(data)
    bad = jnp.zeros((3, 32, 32, 3))
    try:
        served(variables, bad)
    except Exception:
        return
    raise AssertionError("shape mismatch silently accepted")


def test_export_cross_platform_from_cpu_host():
    """A CPU host can lower the artifact for TPU serving (the deployment
    path: build artifacts in CI, serve on chips)."""
    from jax import export as jax_export

    model, variables = _model_and_vars()
    data = export_forward(model, variables, (2, 32, 32, 3),
                          platforms=("tpu", "cpu"))
    exported = jax_export.deserialize(data)
    assert exported.platforms == ("tpu", "cpu")
    # and it still runs on this (CPU) host
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    served = load_forward(data)
    np.testing.assert_allclose(
        np.asarray(served(variables, img)),
        np.asarray(model.apply(variables, img)), atol=1e-6, rtol=1e-6)
