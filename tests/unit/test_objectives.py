"""Objective-wrapper tests: losses finite, jit-safe, and — the §8.5
regression fence — nonzero gradients into ALL encoder params (exactly what
the reference's .numpy() escapes silently break)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models.vit import ViT
from vit_tpu.layers.common import Transformer
from vit_tpu.objectives import (
    MAE, MPP, SimMIM, DistillableViT, DistillWrapper,
)


def _encoder():
    return ViT(image_size=64, patch_size=16, num_classes=10, dim=64,
               depth=2, heads=2, mlp_dim=128, dim_head=32)


def _grad_check(module, img, rngs, encoder_key="encoder"):
    params = module.init({"params": jax.random.PRNGKey(0), **rngs}, img)
    loss = module.apply(params, img, rngs=rngs)
    assert jnp.isfinite(loss)

    def loss_fn(p):
        return module.apply(p, img, rngs=rngs)

    grads = jax.grad(loss_fn)(params)
    enc_grads = grads["params"][encoder_key]
    leaves = jax.tree.leaves(enc_grads)
    assert leaves, "no encoder grads found"
    nonzero = [float(jnp.max(jnp.abs(g))) > 0 for g in leaves]
    frac = sum(nonzero) / len(nonzero)
    assert frac > 0.9, f"only {frac:.0%} of encoder grads nonzero"
    return float(loss)


def test_mae_loss_and_grads():
    mae = MAE(image_size=64, encoder=_encoder(), masking_ratio=0.75,
              decoder_dim=32, decoder_depth=1)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _grad_check(mae, img, {"mask": jax.random.PRNGKey(2)})


def test_mae_jit_and_determinism():
    mae = MAE(image_size=64, encoder=_encoder(), decoder_dim=32)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = mae.init(jax.random.PRNGKey(0), img)
    l1 = mae.apply(params, img)
    l2 = jax.jit(lambda p, x: mae.apply(p, x))(params, img)
    assert jnp.allclose(l1, l2, atol=1e-6)


def test_simmim_loss_and_grads():
    mim = SimMIM(image_size=64, encoder=_encoder(), masking_ratio=0.5)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _grad_check(mim, img, {"mask": jax.random.PRNGKey(2)})


def test_mpp_loss_and_grads():
    mpp = MPP(image_size=64, transformer=_encoder(), patch_size=16,
              mask_prob=0.5)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    loss = _grad_check(mpp, img, {"mask": jax.random.PRNGKey(2)},
                       encoder_key="transformer")
    # CE over 2^(3*3)=512 classes should start near log(512)
    assert 2.0 < loss < 12.0


def test_mpp_bucketize_labels():
    # one patch, constant color 0.9 with 1 bit/channel -> bucket 1 per
    # channel -> label 1 + 2 + 4 = 7
    from vit_tpu.objectives.mpp import MPPLoss

    loss_mod = MPPLoss(patch_size=2, channels=3, output_channel_bits=1,
                       max_pixel_val=1.0)
    target = jnp.full((1, 2, 2, 3), 0.9)
    logits = jnp.zeros((1, 1, 8)).at[0, 0, 7].set(100.0)
    mask = jnp.ones((1, 1), bool)
    val = loss_mod.apply({}, logits, target, mask)
    assert float(val) < 1e-3  # correct class ⇒ ~zero CE


def test_distill_wrapper_soft_and_hard():
    teacher = _encoder()
    student = DistillableViT(image_size=64, patch_size=16, num_classes=10,
                             dim=64, depth=2, heads=2, mlp_dim=128,
                             dim_head=32)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    labels = jnp.array([1, 7])

    for hard in (False, True):
        w = DistillWrapper(teacher=teacher, student=student, temperature=3.0,
                           alpha=0.5, hard=hard)
        params = w.init(jax.random.PRNGKey(0), (img, labels))
        loss = w.apply(params, (img, labels))
        assert jnp.isfinite(loss), hard

        def loss_fn(p):
            return w.apply(p, (img, labels))

        grads = jax.grad(loss_fn)(params)
        # teacher must receive NO gradient (stop_gradient)
        t_leaves = jax.tree.leaves(grads["params"]["teacher"])
        assert all(float(jnp.max(jnp.abs(g))) == 0 for g in t_leaves)
        # student must receive gradient
        s_leaves = jax.tree.leaves(grads["params"]["student"])
        assert any(float(jnp.max(jnp.abs(g))) > 0 for g in s_leaves)


def test_distill_one_hot_labels_match_sparse():
    teacher = _encoder()
    student = DistillableViT(image_size=64, patch_size=16, num_classes=10,
                             dim=64, depth=1, heads=2, mlp_dim=128,
                             dim_head=32)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    labels = jnp.array([3, 9])
    one_hot = jax.nn.one_hot(labels, 10)
    w = DistillWrapper(teacher=teacher, student=student)
    params = w.init(jax.random.PRNGKey(0), (img, labels))
    l_sparse = w.apply(params, (img, labels))
    l_dense = w.apply(params, (img, one_hot))
    assert jnp.allclose(l_sparse, l_dense, atol=1e-6)
