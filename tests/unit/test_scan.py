"""ScannedTransformer ≡ unrolled Transformer (same params, same outputs)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.layers.common import Transformer
from vit_tpu.layers.scan import (ScannedTransformer, stack_transformer_params,
                                 unstack_transformer_params)

CFG = dict(dim=64, depth=4, heads=2, dim_head=32, mlp_dim=128)


def test_scan_matches_unrolled():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 64))
    unrolled = Transformer(**CFG)
    params_u = unrolled.init(jax.random.PRNGKey(0), x)["params"]
    out_u = unrolled.apply({"params": params_u}, x)

    scanned = ScannedTransformer(**CFG)
    params_s = stack_transformer_params(params_u, CFG["depth"])
    out_s = scanned.apply({"params": params_s}, x)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               atol=2e-5)

    # round-trip back to unrolled layout
    back = unstack_transformer_params(params_s, CFG["depth"])
    out_b = unrolled.apply({"params": back}, x)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_b), atol=0)


def test_scan_remat_grads_match():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 64))
    scanned = ScannedTransformer(**CFG)
    remat = ScannedTransformer(**CFG, remat=True)
    params = scanned.init(jax.random.PRNGKey(0), x)["params"]

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    g1 = jax.grad(lambda p: loss(scanned, p))(params)
    g2 = jax.grad(lambda p: loss(remat, p))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)
