"""Model-level scan_layers flag: numerics identical to the unrolled encoder
after param conversion, across ViT / T2T-ViT / PiT."""

import jax
import jax.numpy as jnp

from vit_tpu import PiT, T2TViT, ViT
from vit_tpu.layers.scan import (stack_transformer_params,
                                 unstack_transformer_params)

CFG = dict(image_size=32, patch_size=8, num_classes=5, dim=32, depth=3,
           heads=2, mlp_dim=64, dim_head=16)


def test_vit_scan_matches_unrolled():
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    m0 = ViT(**CFG)
    p0 = m0.init(jax.random.PRNGKey(0), img)
    m1 = ViT(**CFG, scan_layers=True)
    p1 = {"params": dict(p0["params"])}
    p1["params"]["transformer"] = stack_transformer_params(
        p0["params"]["transformer"], CFG["depth"])
    assert jnp.max(jnp.abs(m0.apply(p0, img) - m1.apply(p1, img))) < 1e-5


def test_vit_scan_grads_match_unrolled():
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    m0 = ViT(**CFG)
    p0 = m0.init(jax.random.PRNGKey(0), img)
    m1 = ViT(**CFG, scan_layers=True)
    p1 = {"params": dict(p0["params"])}
    p1["params"]["transformer"] = stack_transformer_params(
        p0["params"]["transformer"], CFG["depth"])

    g0 = jax.grad(lambda p: jnp.sum(jnp.sin(m0.apply(p, img))))(p0)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m1.apply(p, img))))(p1)
    g1_unstacked = unstack_transformer_params(
        jax.tree.map(lambda a: a, g1["params"]["transformer"]), CFG["depth"])
    for name, sub in g0["params"]["transformer"].items():
        for a, b in zip(jax.tree.leaves(sub),
                        jax.tree.leaves(g1_unstacked[name])):
            assert jnp.max(jnp.abs(a - jnp.asarray(b))) < 1e-4, name


def test_stack_unstack_roundtrip():
    m0 = ViT(**CFG)
    img = jnp.zeros((1, 32, 32, 3))
    p0 = m0.init(jax.random.PRNGKey(0), img)["params"]["transformer"]
    stacked = stack_transformer_params(p0, CFG["depth"])
    back = unstack_transformer_params(stacked, CFG["depth"])
    for k, sub in p0.items():
        for a, b in zip(jax.tree.leaves(sub), jax.tree.leaves(back[k])):
            assert jnp.array_equal(a, jnp.asarray(b)), k


def test_t2t_pit_scan_flags_run():
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    t = T2TViT(image_size=64, num_classes=5, dim=32, depth=2, heads=2,
               mlp_dim=64, dim_head=16, scan_layers=True)
    pt = t.init(jax.random.PRNGKey(0), img)
    assert t.apply(pt, img).shape == (2, 5)

    img32 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    pi = PiT(image_size=32, patch_size=8, num_classes=5, dim=16,
             depth=(1, 1), heads=2, mlp_dim=32, dim_head=8, scan_layers=True)
    pp = pi.init(jax.random.PRNGKey(0), img32)
    assert pi.apply(pp, img32).shape == (2, 5)
