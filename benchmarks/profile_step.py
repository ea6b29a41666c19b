"""Op-level profile of the headline workloads (BASELINE.md).

Usage: python benchmarks/profile_step.py [b32_train|b16_infer]

Captures a short XPlane trace on the real chip and prints the device-op
breakdown via ``vit_tpu.utils.profiling.op_breakdown`` — the tool that
localized round 1's attention-fusion bottleneck (ROUND1_NOTES.md).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def b32_train():
    """The bench.py headline: ViT-B/32 @256 fwd+bwd, batch 128, bf16."""
    from vit_tpu import ViT
    from vit_tpu.parallel.train import cross_entropy_loss

    batch = 128
    model = ViT(image_size=256, patch_size=32, num_classes=1000,
                dim=1024, depth=6, heads=16, mlp_dim=2048, dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3),
                            jnp.bfloat16)
    labels = jnp.arange(batch) % 1000
    params = model.init(jax.random.PRNGKey(0), img)
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, img, labels):
        def loss_fn(p):
            return cross_entropy_loss(model.apply(p, img), labels)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def run(n):
        nonlocal params, opt_state
        loss = None
        for _ in range(n):
            params, opt_state, loss = step(params, opt_state, img, labels)
        float(loss)

    return run


def b16_infer():
    """The roofline north star: ViT-B/16 @224 inference, batch 64, bf16.

    Serving setup: weights pre-cast to bf16 once (per-step f32→bf16 kernel
    converts measured 0.41 ms/step otherwise)."""
    from vit_tpu import ViT, cast_params

    batch = 64
    model = ViT(image_size=224, patch_size=16, num_classes=1000,
                dim=768, depth=12, heads=12, mlp_dim=3072, dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3),
                            jnp.bfloat16)
    params = cast_params(model.init(jax.random.PRNGKey(0), img), jnp.bfloat16)
    fwd = jax.jit(lambda p, x: model.apply(p, x))

    def run(n):
        out = None
        for _ in range(n):
            out = fwd(params, img)
        float(out.reshape(-1)[0])

    return run


def model_run(name, mode="infer", batch=64):
    """Profile any registry model (run_benchmarks.py names), infer or train."""
    from run_benchmarks import (_BATCH_OVERRIDES, _extras, _more_models,
                                _regionvit, model_registry)
    from vit_tpu import cast_params
    from vit_tpu.parallel.train import cross_entropy_loss

    dtype = jnp.bfloat16
    registry = model_registry(dtype)
    registry["regionvit"] = _regionvit(dtype)
    registry.update(_extras(dtype))
    registry.update(_more_models(dtype))
    model, image_size = registry[name]
    batch = _BATCH_OVERRIDES.get(name, batch)

    img = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, image_size, image_size, 3), dtype)
    variables = model.init(jax.random.PRNGKey(0), img)
    has_bn = "batch_stats" in variables

    if mode == "infer":
        serve_vars = cast_params(variables, dtype)
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        # ring of distinct inputs: the tunnel memoizes identical executions
        ring = [jax.random.normal(jax.random.PRNGKey(10 + i),
                                  (batch, image_size, image_size, 3), dtype)
                for i in range(4)]

        def run(n):
            outs = [fwd(serve_vars, ring[i % len(ring)]) for i in range(n)]
            jax.block_until_ready(outs)

        return run, batch

    labels = jnp.arange(batch) % 1000
    tx = optax.sgd(1e-3)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, img, labels):
        def loss_fn(v):
            if has_bn:
                out, _ = model.apply(v, img, training=True,
                                     mutable=["batch_stats"])
            else:
                out = model.apply(v, img)
            if isinstance(out, tuple):
                out = out[0]
            return cross_entropy_loss(out, labels)
        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    state = [variables, opt_state]

    def run(n):
        loss = None
        for _ in range(n):
            state[0], state[1], loss = step(state[0], state[1], img, labels)
        float(loss)

    return run, batch


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "b16_infer"
    if which.startswith("model:"):
        name = which.split(":", 1)[1]
        mode = sys.argv[2] if len(sys.argv) > 2 else "infer"
        run, batch = model_run(name, mode)
        which = f"{name}_{mode}_b{batch}"
    else:
        run = {"b32_train": b32_train, "b16_infer": b16_infer}[which]()
    run(5)  # compile + settle

    import time
    t0 = time.perf_counter()
    run(20)
    step_ms = (time.perf_counter() - t0) / 20 * 1e3

    from vit_tpu.utils.profiling import op_breakdown, trace
    logdir = f"/tmp/vit_tpu_profile_{which}"
    with trace(logdir):
        run(10)

    print(f"== {which}: {step_ms:.2f} ms/step (wall) ==")
    for r in op_breakdown(logdir, top=25):
        print(f"{r['pct']:5.1f}%  {r['total_ms']:8.3f} ms  "
              f"x{r['occurrences']:<4d} {r['name'][:100]}")


if __name__ == "__main__":
    main()
