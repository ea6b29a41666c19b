"""XPlane re-measure: fused block kernels at the B/32 headline shape (n=65).

Round 2 rejected Pallas kernels at n=65 ("all kernel combos regressed
B/32 train 24.6 -> 24.9-30.7 ms") — but that measurement predates the
late-round kernel work (bf16-operand dots, batch-divisor blocks, the 3-D
MLP path, late-divide softmax).  VERDICT round-3 ask #8 wants the B/32
headline > 0.58 or a written rejection with fresh XPlane numbers; this
script produces one or the other.

Configs: auto (production gates: XLA at n=65) vs bmajor (fused attention
+ MLP blocks forced at n=65 via the experimental "bmajor" mode).

Usage: python benchmarks/exp_b32_fused.py [auto|bmajor ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_step(mode):
    from vit_tpu import ViT
    from vit_tpu.parallel.train import cross_entropy_loss

    batch = 128
    model = ViT(image_size=256, patch_size=32, num_classes=1000,
                dim=1024, depth=6, heads=16, mlp_dim=2048,
                dtype=jnp.bfloat16,
                fused_attention=mode, fused_mlp=mode)
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
        return optax.apply_updates(params, updates), opt_state, loss

    state = [params, opt_state]

    def run(n):
        loss = None
        for _ in range(n):
            state[0], state[1], loss = step(state[0], state[1], img, labels)
        float(loss)

    return run, batch


def main():
    from vit_tpu.utils.profiling import op_breakdown, trace

    names = sys.argv[1:] or ["auto", "bmajor"]
    for name in names:
        t0 = time.time()
        run, batch = make_step(name)
        run(3)
        compile_s = time.time() - t0
        logdir = f"/tmp/vit_exp_b32_{name}"
        with trace(logdir):
            run(10)
        rows = op_breakdown(logdir, top=1_000_000)
        total = sum(r["total_ms"] for r in rows) / 10
        print(f"\n== {name}: {total:.2f} ms/step device = "
              f"{batch / (total / 1e3):.0f} img/s (compile {compile_s:.0f}s) ==",
              flush=True)
        for r in rows[:18]:
            print(f"{r['pct']:5.1f}%  {r['total_ms'] / 10:8.3f} ms  "
                  f"x{r['occurrences'] / 10:<6.1f} {r['name'][:96]}",
                  flush=True)


if __name__ == "__main__":
    main()
