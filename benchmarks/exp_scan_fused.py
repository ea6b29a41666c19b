"""XPlane diff: scanned vs unrolled encoder, fused kernels on/off.

VERDICT round-3 ask #4: root-cause why ``ScannedTransformer`` (the
compile-time lever) runs ~2.4x slower than the unrolled encoder when the
fused Pallas blocks are enabled (ROUND2_NOTES §6).  Measures the B/16
train step in three configs and prints per-op device breakdowns:

  unrolled_fused   Transformer (default production path)
  scan_fused       ScannedTransformer(fused="auto")
  scan_xla         ScannedTransformer(fused="never")

Usage: python benchmarks/exp_scan_fused.py [config ...]
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


def make_step(scan_layers, fused):
    from vit_tpu import ViT
    from vit_tpu.parallel.train import cross_entropy_loss

    batch = 64
    model = ViT(image_size=224, patch_size=16, num_classes=1000,
                dim=768, depth=12, heads=12, mlp_dim=3072,
                dtype=jnp.bfloat16, scan_layers=scan_layers,
                fused_attention=fused, fused_mlp=fused)
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3),
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


CONFIGS = {
    "unrolled_fused": dict(scan_layers=False, fused="auto"),
    "scan_fused": dict(scan_layers=True, fused="auto"),
    "scan_xla": dict(scan_layers=True, fused="never"),
}


def main():
    from vit_tpu.utils.profiling import op_breakdown, trace

    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        cfg = CONFIGS[name]
        t0 = time.time()
        run, batch = make_step(**cfg)
        run(3)  # compile + settle
        compile_s = time.time() - t0

        logdir = f"/tmp/vit_exp_scan_{name}"
        with trace(logdir):
            run(10)
        rows = op_breakdown(logdir, top=20)
        total = sum(r["total_ms"] for r in op_breakdown(logdir, top=1_000_000))
        print(f"\n== {name}: {total / 10:.2f} ms/step device "
              f"(compile {compile_s:.0f}s) ==", flush=True)
        for r in rows:
            print(f"{r['pct']:5.1f}%  {r['total_ms'] / 10:8.3f} ms  "
                  f"x{r['occurrences'] / 10:<6.1f} {r['name'][:96]}",
                  flush=True)


if __name__ == "__main__":
    main()
