"""Sharded train / infer steps.

The reference's only training story is a bare eager ``tf.GradientTape`` loop
(reference mpp.py:243-251) on one device.  Here a train step is one jitted
SPMD program over a ``data`` × ``model`` mesh: batches shard over ``data``,
params optionally shard over ``model`` (vit_tpu.parallel.sharding), XLA
inserts the grad all-reduce over ICI.  bf16 compute / f32 params is the
default production policy; parity suites run f32.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_tpu.parallel import sharding as shd
from vit_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Sparse softmax CE in f32."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """Sharding tree for a TrainState: params/opt_state by the TP rule table
    (pure-DP meshes degenerate to fully replicated), step replicated."""
    return TrainState(
        step=replicated(mesh),
        params=shd.param_shardings(mesh, state.params),
        opt_state=jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, shd._spec_for_path(path, leaf)),
            state.opt_state,
        ),
    )


def _accum_value_and_grad(loss_of: Callable, params, batch, rng,
                          accum_steps: int):
    """Mean loss/grad over ``accum_steps`` microbatches via ``lax.scan``.

    ``batch`` is a pytree whose leaves share the leading batch axis;
    ``loss_of(params, microbatch, rng) -> scalar``.  The rng is folded per
    microbatch index.  Equals the full-batch gradient for mean-reduced
    losses (and deterministic ``loss_of``)."""
    sizes = {a.shape[0] for a in jax.tree.leaves(batch)}
    assert all(s % accum_steps == 0 for s in sizes), (
        f"batch {sizes} must divide over {accum_steps} accumulation steps")
    micro = jax.tree.map(
        lambda a: a.reshape(accum_steps, -1, *a.shape[1:]), batch)

    def body(carry, xs):
        g_acc, l_acc = carry
        mb, i = xs
        l, g = jax.value_and_grad(loss_of)(
            params, mb, jax.random.fold_in(rng, i))
        return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

    init = (jax.tree.map(jnp.zeros_like, params),
            jnp.zeros((), jnp.float32))
    (g_sum, l_sum), _ = jax.lax.scan(
        body, init, (micro, jnp.arange(accum_steps)))
    return l_sum / accum_steps, jax.tree.map(
        lambda g: g / accum_steps, g_sum)


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Optional[Callable] = None,
    donate: bool = True,
    accum_steps: int = 1,
):
    """Build a jitted SPMD classification train step.

    ``apply_fn(params, images, rng) -> logits``; the returned step has
    signature ``step(state, images, labels, rng) -> (state, metrics)`` with
    images/labels sharded over the ``data`` axis.

    ``accum_steps > 1`` splits the batch into that many microbatches and
    accumulates gradients over a ``lax.scan`` before the single optimizer
    update — activation memory drops ~accum_steps× (one microbatch of
    activations live at a time) at unchanged math: the accumulated mean
    gradient equals the full-batch gradient for mean-reduced losses.  The
    HBM lever for activation-heavy models (e.g. ScalableViT's stage-1
    attention maps) without changing the effective batch.
    """
    loss_fn = loss_fn or cross_entropy_loss

    def step(state: TrainState, images, labels, rng):
        def loss_of(params, batch, rng):
            logits = apply_fn(params, batch[0], rng)
            return loss_fn(logits, batch[1])

        if accum_steps > 1:
            loss, grads = _accum_value_and_grad(
                loss_of, state.params, (images, labels), rng, accum_steps)
        else:
            loss, grads = jax.value_and_grad(loss_of)(
                state.params, (images, labels), rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        metrics = {"loss": loss, "step": new_state.step}
        return new_state, metrics

    def compile_step(state: TrainState):
        st_sh = state_shardings(mesh, state)
        data_sh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step,
            in_shardings=(st_sh, data_sh, data_sh, rep),
            out_shardings=(st_sh, rep),
            donate_argnums=(0,) if donate else (),
        )

    return step, compile_step


def make_loss_train_step(
    loss_apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
    accum_steps: int = 1,
):
    """Same, for self-supervised objectives whose forward IS the loss
    (MAE/SimMIM/MPP/Distill wrappers): ``loss_apply_fn(params, batch, rng)
    -> scalar loss``.  ``accum_steps`` microbatches the leading axis of
    every array in ``batch`` (see :func:`make_train_step`)."""

    def step(state: TrainState, batch, rng):
        if accum_steps > 1:
            loss, grads = _accum_value_and_grad(
                loss_apply_fn, state.params, batch, rng, accum_steps)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_apply_fn(p, batch, rng)
            )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, {"loss": loss, "step": new_state.step}

    def compile_step(state: TrainState):
        st_sh = state_shardings(mesh, state)
        data_sh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step,
            in_shardings=(st_sh, data_sh, rep),
            out_shardings=(st_sh, rep),
            donate_argnums=(0,) if donate else (),
        )

    return step, compile_step


class TrainStateWithModelState(NamedTuple):
    """Train state for models carrying non-param collections (BatchNorm
    batch_stats): LeViT, CvT, MobileViT, the conv stems."""

    step: jax.Array
    params: Any
    model_state: Any
    opt_state: Any


def create_bn_train_state(params, model_state,
                          tx: optax.GradientTransformation):
    return TrainStateWithModelState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=tx.init(params),
    )


def bn_state_shardings(mesh: Mesh, state: TrainStateWithModelState):
    rep = replicated(mesh)
    return TrainStateWithModelState(
        step=rep,
        params=shd.param_shardings(mesh, state.params),
        model_state=jax.tree.map(lambda _: rep, state.model_state),
        opt_state=jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, shd._spec_for_path(path, leaf)),
            state.opt_state,
        ),
    )


def make_bn_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Optional[Callable] = None,
    donate: bool = True,
):
    """Sharded train step for BatchNorm models.

    ``apply_fn(params, model_state, images, rng) -> (logits,
    new_model_state)``.  Under jit+sharding the BN batch reductions are
    global (GSPMD all-reduces them), so this is sync-BN across the ``data``
    axis by construction.
    """
    loss_fn = loss_fn or cross_entropy_loss

    def step(state: TrainStateWithModelState, images, labels, rng):
        def loss_of(params):
            logits, new_model_state = apply_fn(params, state.model_state,
                                               images, rng)
            return loss_fn(logits, labels), new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainStateWithModelState(
            state.step + 1, params, new_model_state, opt_state)
        return new_state, {"loss": loss, "step": new_state.step}

    def compile_step(state: TrainStateWithModelState):
        st_sh = bn_state_shardings(mesh, state)
        data_sh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step,
            in_shardings=(st_sh, data_sh, data_sh, rep),
            out_shardings=(st_sh, rep),
            donate_argnums=(0,) if donate else (),
        )

    return step, compile_step
