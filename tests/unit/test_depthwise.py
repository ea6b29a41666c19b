"""SPMD-safe grouped conv: taps equivalence + the XLA dkernel-double-count
regression fence (vit_tpu/ops/depthwise.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_tpu.ops.depthwise import _taps, grouped_conv2d


def _lax_grouped(x, k, strides, padding):
    return lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


CASES = [
    # (H, W, C, kh, kw, strides, mult)  — every zoo config class:
    (8, 8, 16, 3, 3, (1, 1), 1),   # PEG 3×3/s1
    (9, 7, 16, 3, 3, (2, 2), 1),   # strided depthwise, odd dims (TF-SAME)
    (8, 8, 16, 3, 3, (2, 2), 2),   # PiT pool: groups=C, cout=2C
]


@pytest.mark.parametrize("H,W,C,kh,kw,strides,mult", CASES)
def test_taps_matches_lax_forward(H, W, C, kh, kw, strides, mult):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, C))
    k = jax.random.normal(jax.random.PRNGKey(1), (kh, kw, 1, C * mult))
    np.testing.assert_allclose(
        np.asarray(_taps(x, k, strides, "SAME")),
        np.asarray(_lax_grouped(x, k, strides, "SAME")),
        atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("H,W,C,kh,kw,strides,mult", CASES)
def test_custom_vjp_matches_plain_grad(H, W, C, kh, kw, strides, mult):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, C))
    k = jax.random.normal(jax.random.PRNGKey(3), (kh, kw, 1, C * mult))

    def loss_ours(x, k):
        return jnp.sum(jnp.sin(grouped_conv2d(x, k, strides, "SAME")))

    def loss_ref(x, k):
        return jnp.sum(jnp.sin(_lax_grouped(x, k, strides, "SAME")))

    gx, gk = jax.grad(loss_ours, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r),
                               atol=1e-5, rtol=1e-5)


def test_dkernel_correct_under_model_axis_replication():
    """The regression fence for the XLA SPMD bug this op exists for: on a
    data×model mesh with the conv replicated over `model` (batch-sharded
    input, replicated kernel), the stock grouped-conv dkernel is exactly
    model_size× too large; grouped_conv2d must match the single-device
    gradient."""
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices("cpu")[:8]).reshape(4, 2), ("data", "model"))
    C = 16
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 8, 8, C))
    k = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 1, C))

    def loss(fn):
        return lambda x, k: jnp.sum(fn(x, k) ** 2)

    ours = lambda x, k: grouped_conv2d(x, k, (1, 1), "SAME")
    stock = lambda x, k: _lax_grouped(x, k, (1, 1), "SAME")

    gk_ref = jax.grad(loss(ours), argnums=1)(x, k)  # single device
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ks = jax.device_put(k, NamedSharding(mesh, P()))

    gk_ours = jax.jit(jax.grad(loss(ours), argnums=1))(xs, ks)
    np.testing.assert_allclose(np.asarray(gk_ours), np.asarray(gk_ref),
                               atol=1e-5, rtol=1e-5)

    # Document the bug itself: if this starts PASSING, the workaround can
    # be retired (XLA fixed the partial-replication bookkeeping).
    gk_stock = jax.jit(jax.grad(loss(stock), argnums=1))(xs, ks)
    ratio = float(jnp.mean(jnp.asarray(gk_stock) / jnp.asarray(gk_ref)))
    assert abs(ratio - 2.0) < 1e-3, (
        f"stock grouped-conv dkernel ratio {ratio}: XLA bug gone? retire "
        "the taps backward")
