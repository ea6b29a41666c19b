"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Exercises the real pjit path — batch sharded over ``data``, params over
``model`` — with XLA collectives, no TPU needed (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu import ViT
from vit_tpu.parallel import mesh as mesh_lib
from vit_tpu.parallel import sharding as shd
from vit_tpu.parallel.train import (
    TrainState, create_train_state, make_train_step,
)


@pytest.fixture(scope="module")
def model_and_params():
    v = ViT(image_size=32, patch_size=8, num_classes=10,
            dim=64, depth=2, heads=2, mlp_dim=128, dim_head=32)
    img = jnp.zeros((8, 32, 32, 3))
    params = v.init(jax.random.PRNGKey(0), img)["params"]
    return v, params


def _run_steps(v, params, mesh, n_steps=2):
    tx = optax.sgd(1e-2)
    # Copy: the train step donates its input state, which would delete the
    # module-scoped fixture params.
    params = jax.tree.map(jnp.array, params)
    state = create_train_state(params, tx)

    def apply_fn(p, images, rng):
        return v.apply({"params": p}, images)

    _, compile_step = make_train_step(apply_fn, tx, mesh)
    step = compile_step(state)

    # Place state on mesh.
    from vit_tpu.parallel.train import state_shardings
    state = jax.device_put(state, state_shardings(mesh, state))

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 10
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, images, labels, rng)
        losses.append(float(metrics["loss"]))
    return losses


def test_dp8_train_step(model_and_params):
    v, params = model_and_params
    mesh = mesh_lib.make_mesh((8, 1))
    losses = _run_steps(v, params, mesh)
    assert np.isfinite(losses).all()
    assert losses[1] < losses[0]  # SGD reduces loss on a fixed batch


def test_dp4_tp2_matches_dp8(model_and_params):
    """TP sharding must be numerically equivalent to pure DP."""
    v, params = model_and_params
    losses_dp = _run_steps(v, params, mesh_lib.make_mesh((8, 1)))
    losses_tp = _run_steps(v, params, mesh_lib.make_mesh((4, 2)))
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4)


def test_param_sharding_rules(model_and_params):
    v, params = model_and_params
    mesh = mesh_lib.make_mesh((2, 4))
    sharded = shd.shard_params(mesh, params)
    qkv = sharded["transformer"]["attn_0"]["to_qkv"]["kernel"]
    spec = qkv.sharding.spec
    assert tuple(spec) == (None, "model")
    fc2 = sharded["transformer"]["mlp_0"]["fc2"]["kernel"]
    assert tuple(fc2.sharding.spec) == ("model", None)
    # Values survive the placement round-trip.
    np.testing.assert_array_equal(
        np.asarray(qkv), np.asarray(params["transformer"]["attn_0"]["to_qkv"]["kernel"])
    )


def test_batchnorm_model_dp_train_step():
    """BN models (LeViT) train sharded; under jit+sharding the batch-stat
    reductions are global (sync-BN by construction)."""
    from vit_tpu.models.levit import LeViT
    from vit_tpu.parallel.train import (bn_state_shardings,
                                        create_bn_train_state,
                                        make_bn_train_step)

    m = LeViT(image_size=32, num_classes=6, stages=1, dim=32, depth=1,
              heads=2, mlp_mult=2, dim_key=8, dim_value=16)
    img = jnp.zeros((8, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), img)
    params, model_state = variables["params"], {"batch_stats": variables["batch_stats"]}

    def apply_fn(p, ms, images, rng):
        out, updates = m.apply({"params": p, **ms}, images, training=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": rng})
        return out, updates

    mesh = mesh_lib.make_mesh((8, 1))
    tx = optax.sgd(1e-2)
    state = create_bn_train_state(params, model_state, tx)
    _, compile_step = make_bn_train_step(apply_fn, tx, mesh)
    step = compile_step(state)
    state = jax.device_put(state, bn_state_shardings(mesh, state))

    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 6
    before = np.asarray(
        state.model_state["batch_stats"]["stage_0"]["attn_0"]["to_q_bn"]["mean"])
    losses = []
    for _ in range(2):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    after = np.asarray(
        state.model_state["batch_stats"]["stage_0"]["attn_0"]["to_q_bn"]["mean"])
    assert np.isfinite(losses).all() and losses[1] < losses[0]
    assert not np.allclose(before, after)  # stats updated across the mesh


def _levit_losses(mesh_shape, n_steps=2):
    from vit_tpu.models.levit import LeViT
    from vit_tpu.parallel.train import (bn_state_shardings,
                                        create_bn_train_state,
                                        make_bn_train_step)

    m = LeViT(image_size=32, num_classes=6, stages=1, dim=32, depth=1,
              heads=2, mlp_mult=2, dim_key=8, dim_value=16)
    img = jnp.zeros((8, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), img)
    params = variables["params"]
    model_state = {"batch_stats": variables["batch_stats"]}

    def apply_fn(p, ms, images, rng):
        return m.apply({"params": p, **ms}, images, training=True,
                       mutable=["batch_stats"], rngs={"dropout": rng})

    mesh = mesh_lib.make_mesh(mesh_shape)
    tx = optax.sgd(1e-2)
    state = create_bn_train_state(params, model_state, tx)
    _, compile_step = make_bn_train_step(apply_fn, tx, mesh)
    step = compile_step(state)
    state = jax.device_put(state, bn_state_shardings(mesh, state))

    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 6
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    return state, losses


def test_levit_dp4_tp2_matches_dp8():
    """Conv-hybrid TP (1×1-conv column/row rules) must be numerically
    equivalent to pure DP — the rule-table extension actually shards the
    LeViT projections instead of replicating them."""
    from vit_tpu.parallel import sharding as shd_mod

    _, losses_dp = _levit_losses((8, 1))
    state_tp, losses_tp = _levit_losses((4, 2))
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4)

    # and TP actually fired: the to_q conv kernel is split over `model`
    k = state_tp.params["stage_0"]["attn_0"]["to_q"]["kernel"]
    assert tuple(k.sharding.spec) == (None, None, None, "model")


def test_self_supervised_loss_train_step_on_mesh():
    """make_loss_train_step drives MAE (forward IS the loss) sharded over
    the data axis, rng threading included."""
    from vit_tpu.objectives import MAE
    from vit_tpu.parallel.train import make_loss_train_step, state_shardings

    enc = ViT(image_size=32, patch_size=8, num_classes=10, dim=32, depth=1,
              heads=2, mlp_dim=64, dim_head=16)
    mae = MAE(image_size=32, encoder=enc, decoder_dim=16, decoder_depth=1)
    img = jnp.zeros((8, 32, 32, 3))
    params = mae.init({"params": jax.random.PRNGKey(0)}, img)["params"]

    def loss_apply(p, batch, rng):
        return mae.apply({"params": p}, batch, training=True,
                         rngs={"mask": rng, "dropout": rng})

    mesh = mesh_lib.make_mesh((4, 2))
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    _, compile_step = make_loss_train_step(loss_apply, tx, mesh)
    step = compile_step(state)
    state = jax.device_put(state, state_shardings(mesh, state))

    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    losses = []
    rng = jax.random.PRNGKey(7)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, images, k)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def _twins_losses(mesh_shape, n_steps=2):
    from vit_tpu.models.twins_svt import TwinsSVT
    from vit_tpu.parallel.train import state_shardings

    m = TwinsSVT(num_classes=6,
                 s1_emb_dim=32, s1_patch_size=4, s1_local_patch_size=4,
                 s1_global_k=4, s1_depth=1,
                 s2_emb_dim=32, s2_patch_size=2, s2_local_patch_size=4,
                 s2_global_k=4, s2_depth=1,
                 s3_emb_dim=32, s3_patch_size=2, s3_local_patch_size=2,
                 s3_global_k=2, s3_depth=1,
                 s4_emb_dim=32, s4_patch_size=2, s4_local_patch_size=2,
                 s4_global_k=2, s4_depth=1)
    img = jnp.zeros((8, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), img)["params"]

    def apply_fn(p, images, rng):
        return m.apply({"params": p}, images)

    mesh = mesh_lib.make_mesh(mesh_shape)
    # small lr: at 1e-2 this config diverges (loss 5.9 -> 21 in one step)
    # and the chaotic blow-up amplifies all-reduce ordering noise past any
    # tolerance; the pin wants a stable regime.
    tx = optax.sgd(1e-3)
    state = create_train_state(params, tx)
    _, compile_step = make_train_step(apply_fn, tx, mesh)
    step = compile_step(state)
    state = jax.device_put(state, state_shardings(mesh, state))

    images = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3))
    labels = jnp.arange(8) % 6
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    return state, losses


def test_twins_svt_dp4_tp2_matches_dp8():
    """Second conv-hybrid TP pin (beyond LeViT): Twins-SVT's windowed
    local attention + conv-reduced global attention shard their 1×1-conv
    projections over `model` and stay numerically equivalent to pure DP."""
    _, losses_dp = _twins_losses((8, 1))
    state_tp, losses_tp = _twins_losses((4, 2))
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4)

    k = state_tp.params["s1_pre_transformer"]["local_attn_0"]["to_q"]["kernel"]
    assert tuple(k.sharding.spec) == (None, None, None, "model")


def _mobilevit_losses(mesh_shape, n_steps=2):
    from vit_tpu.models.mobile_vit import MobileViT
    from vit_tpu.parallel.train import (bn_state_shardings,
                                        create_bn_train_state,
                                        make_bn_train_step)

    m = MobileViT(image_size=(64, 64), dims=[16, 24, 32],
                  channels=[8, 8, 12, 12, 16, 16, 24, 24, 32, 32, 48],
                  num_classes=6)
    img = jnp.zeros((8, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), img)
    params = variables["params"]
    model_state = {"batch_stats": variables["batch_stats"]}

    def apply_fn(p, ms, images, rng):
        return m.apply({"params": p, **ms}, images, training=True,
                       mutable=["batch_stats"], rngs={"dropout": rng})

    mesh = mesh_lib.make_mesh(mesh_shape)
    tx = optax.sgd(1e-3)
    state = create_bn_train_state(params, model_state, tx)
    _, compile_step = make_bn_train_step(apply_fn, tx, mesh)
    step = compile_step(state)
    state = jax.device_put(state, bn_state_shardings(mesh, state))

    images = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3))
    labels = jnp.arange(8) % 6
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    return losses


def test_mobilevit_dp4_tp2_matches_dp8():
    """BN batch-stats path + MV2 depthwise convs (GroupedConv) under TP:
    the third conv-hybrid pin, covering the param classes the grouped-conv
    dkernel fix exists for."""
    losses_dp = _mobilevit_losses((8, 1))
    losses_tp = _mobilevit_losses((4, 2))
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4)


def test_grad_accumulation_matches_full_batch(model_and_params):
    """accum_steps=2 over batch 8 must produce the same first update and
    loss as the single full-batch step (mean-reduced CE), sharded DP8."""
    from vit_tpu.parallel.train import state_shardings

    v, params = model_and_params
    mesh = mesh_lib.make_mesh((8, 1))
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 10

    def run(accum):
        tx = optax.sgd(1e-2)
        state = create_train_state(jax.tree.map(jnp.array, params), tx)

        def apply_fn(p, im, rng):
            return v.apply({"params": p}, im)

        _, compile_step = make_train_step(apply_fn, tx, mesh,
                                          accum_steps=accum)
        step = compile_step(state)
        state = jax.device_put(state, state_shardings(mesh, state))
        state, metrics = step(state, images, labels, jax.random.PRNGKey(0))
        return state, float(metrics["loss"])

    s1, l1 = run(1)
    s2, l2 = run(2)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_sharding_rules_cover_the_zoo():
    """Rule-table audit: for a representative slice of the zoo, the big
    matmul params (attention projections, MLP fc1/fc2) must actually get
    `model`-sharded specs — a silent fall-through to replication is a TP
    perf regression the loss-equivalence pins can't see."""
    from vit_tpu import CaiT, CvT, LeViT, ViT
    from vit_tpu.models.twins_svt import TwinsSVT
    from vit_tpu.parallel.sharding import param_specs

    models = {
        "vit": (ViT(image_size=32, patch_size=8, num_classes=5, dim=64,
                    depth=2, heads=2, mlp_dim=128), (1, 32, 32, 3)),
        "cait": (CaiT(image_size=32, patch_size=8, num_classes=5, dim=64,
                      depth=1, cls_depth=1, heads=2, mlp_dim=128),
                 (1, 32, 32, 3)),
        "cvt": (CvT(num_classes=5, s1_emb_dim=32, s1_heads=1, s1_depth=1,
                    s2_emb_dim=48, s2_heads=2, s2_depth=1, s3_emb_dim=64,
                    s3_heads=2, s3_depth=1), (1, 64, 64, 3)),
        "twins": (TwinsSVT(num_classes=5,
                           s1_emb_dim=32, s1_patch_size=4,
                           s1_local_patch_size=4, s1_global_k=4, s1_depth=1,
                           s2_emb_dim=32, s2_patch_size=2,
                           s2_local_patch_size=4, s2_global_k=4, s2_depth=1,
                           s3_emb_dim=32, s3_patch_size=2,
                           s3_local_patch_size=2, s3_global_k=2, s3_depth=1,
                           s4_emb_dim=32, s4_patch_size=2,
                           s4_local_patch_size=2, s4_global_k=2, s4_depth=1),
                  (1, 128, 128, 3)),
        "levit": (LeViT(image_size=64, num_classes=5, stages=2,
                        dim=(32, 48), depth=1, heads=(2, 3), mlp_mult=2,
                        dim_key=8, dim_value=16), (1, 64, 64, 3)),
    }
    import jax.tree_util as jtu

    for name, (m, shape) in models.items():
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros(shape))
        specs = param_specs(variables["params"])
        flat_p = jtu.tree_flatten_with_path(variables["params"])[0]
        flat_s = jtu.tree_flatten_with_path(specs)[0]
        hot, sharded = 0, 0
        for (path, value), (_, spec) in zip(flat_p, flat_s):
            key = jtu.keystr(path)
            if "kernel" not in key:
                continue
            # depthwise halves (h, w, 1, C) with h*w > 1 are grouped convs:
            # replicated by design (no contraction dim to split).
            if value.ndim == 4 and value.shape[2] == 1 \
                    and value.shape[:2] != (1, 1):
                continue
            if any(t in key for t in ("to_q", "to_k", "to_v", "to_qkv",
                                      "to_kv", "to_out", "fc1", "fc2")):
                hot += 1
                if any(ax == "model" for ax in spec if ax is not None):
                    sharded += 1
        assert hot > 0, name
        frac = sharded / hot
        assert frac >= 0.8, (
            f"{name}: only {sharded}/{hot} hot matmul kernels are "
            f"model-sharded — rule-table regression?")


def test_cvt_dp4_tp2_matches_dp8():
    """CvT under TP: BN inside the attention projections + the newly
    sharded mlp_fc1/mlp_fc2 1×1 conv kernels must stay DP-equivalent."""
    from vit_tpu import CvT
    from vit_tpu.parallel.train import (bn_state_shardings,
                                        create_bn_train_state,
                                        make_bn_train_step)

    def losses(mesh_shape, n_steps=2):
        m = CvT(num_classes=6, s1_emb_dim=32, s1_heads=1, s1_depth=1,
                s2_emb_dim=48, s2_heads=2, s2_depth=1,
                s3_emb_dim=64, s3_heads=2, s3_depth=1)
        img = jnp.zeros((8, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), img)
        params = variables["params"]
        model_state = {"batch_stats": variables["batch_stats"]}

        def apply_fn(p, images, rng):
            return m.apply({"params": p, **model_state}, images,
                           training=True, mutable=["batch_stats"],
                           rngs={"dropout": rng})

        mesh = mesh_lib.make_mesh(mesh_shape)
        tx = optax.sgd(1e-3)
        state = create_bn_train_state(params, model_state, tx)
        _, compile_step = make_bn_train_step(
            lambda p, ms, images, rng: m.apply(
                {"params": p, **ms}, images, training=True,
                mutable=["batch_stats"], rngs={"dropout": rng}),
            tx, mesh)
        step = compile_step(state)
        state = jax.device_put(state, bn_state_shardings(mesh, state))
        images = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3))
        labels = jnp.arange(8) % 6
        out = []
        for _ in range(n_steps):
            state, metrics = step(state, images, labels,
                                  jax.random.PRNGKey(2))
            out.append(float(metrics["loss"]))
        return out

    np.testing.assert_allclose(losses((8, 1)), losses((4, 2)), rtol=2e-4)


def test_loss_step_grad_accumulation():
    """accum_steps on the self-supervised step: finite decreasing loss and
    the same param structure as the plain step (MAE's mask rng folds per
    microbatch, so exact equality is not expected — the pin is stability)."""
    from vit_tpu.objectives import MAE
    from vit_tpu.parallel.train import make_loss_train_step, state_shardings

    enc = ViT(image_size=32, patch_size=8, num_classes=10, dim=32, depth=1,
              heads=2, mlp_dim=64, dim_head=16)
    mae = MAE(image_size=32, encoder=enc, decoder_dim=16, decoder_depth=1)
    img = jnp.zeros((8, 32, 32, 3))
    params = mae.init({"params": jax.random.PRNGKey(0)}, img)["params"]

    def loss_apply(p, batch, rng):
        return mae.apply({"params": p}, batch, training=True,
                         rngs={"mask": rng, "dropout": rng})

    mesh = mesh_lib.make_mesh((8, 1))
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    _, compile_step = make_loss_train_step(loss_apply, tx, mesh,
                                           accum_steps=2)
    step = compile_step(state)
    state = jax.device_put(state, state_shardings(mesh, state))
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    losses = []
    rng = jax.random.PRNGKey(7)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, images, k)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
