"""ScalableViT IWSA tier shootout (VERDICT r3 #2 evidence).

The round-3 profile (`profiles/scalable_vit.md`) shows the two IWSA layer
classes dominating the step: stage-1 whole-map attention (b=64, h=2,
n=4096, d=32) runs through flash with d zero-padded 32->64 (23% of step +
1.6 ms/step of explicit pad ops), and stage-2 (b=64, h=4, n=1024, d=32)
runs the materialized XLA path (537 MB of bf16 attention maps per layer —
bandwidth-bound).

Tiers, each measured by XPlane device time over distinct inputs (the
tunnel memoizes identical executions — see BENCHMARKS.md "method"):

  s2_xla      stage-2 shape through the XLA attention (current dispatch)
  s2_flash    stage-2 shape through flash, d padded 32->64 (current pad rule)
  s2_flash32  stage-2 shape through flash at native d=32 (no pad ops)
  s1_flash    stage-1 shape through flash, d padded 32->64 (current route)
  s1_flash32  stage-1 shape through flash at native d=32

Usage: python benchmarks/exp_scalable_iwsa.py [tier ...]   (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPES = {"s1": (64, 2, 4096, 32), "s2": (64, 4, 1024, 32)}
ITERS = 20


def build(tier):
    stage, kind = tier.split("_", 1)
    b, h, n, d = SHAPES[stage]
    scale = d ** -0.5

    if kind == "xla":
        from vit_tpu.ops.attention import scaled_dot_product_attention

        fn = jax.jit(lambda q, k, v: scaled_dot_product_attention(
            q, k, v, scale=scale, use_flash="never"))
    elif kind == "flash":
        from vit_tpu.ops.attention import scaled_dot_product_attention

        fn = jax.jit(lambda q, k, v: scaled_dot_product_attention(
            q, k, v, scale=scale, use_flash="force"))
    elif kind == "flash32":
        from vit_tpu.ops import flash_attention as fa

        fn = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v, scale=scale))
    else:
        raise ValueError(tier)

    rings = []
    for i in range(4):
        ks = jax.random.split(jax.random.PRNGKey(100 + i), 3)
        rings.append(tuple(
            jax.random.normal(kk, (b, h, n, d), jnp.bfloat16) for kk in ks))

    def run(iters):
        outs = [fn(*rings[i % len(rings)]) for i in range(iters)]
        jax.block_until_ready(outs)

    return run


def device_ms_per_call(run, tag):
    from vit_tpu.utils.profiling import op_breakdown, trace

    run(4)  # compile + settle
    logdir = f"/tmp/exp_scalable_iwsa_{tag}"
    with trace(logdir):
        run(ITERS)
    rows = op_breakdown(logdir, top=200)
    total = sum(r["total_ms"] for r in rows)
    return total / ITERS, rows


def main():
    tiers = sys.argv[1:] or ["s2_xla", "s2_flash", "s2_flash32",
                             "s1_flash", "s1_flash32"]
    for tier in tiers:
        run = build(tier)
        ms, rows = device_ms_per_call(run, tier)
        b, h, n, d = SHAPES[tier.split("_", 1)[0]]
        flops = 4 * b * h * n * n * d  # unpadded attention FLOPs
        print(f"== {tier}: {ms:.3f} ms/call device "
              f"({flops / ms / 1e9:.1f} TF/s on unpadded FLOPs) ==")
        for r in rows[:4]:
            print(f"   {r['total_ms'] / ITERS:7.3f} ms  x{r['occurrences']:<4d}"
                  f" {r['name'][:90]}")


if __name__ == "__main__":
    main()
