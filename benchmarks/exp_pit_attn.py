"""Attention-tier shootout at PiT's stage-0 shape (b=64, n=962, d=256, h=4).

benchmarks/profiles/pit.md: the token-major fused attention block runs
4.50 ms/layer at this shape (~21 TF/s — bb starvation against the 962^2
VMEM scores), yet it was extended to n <= 1024 because it beat round-2's
XLA path.  Flash v1 (whole-K/V VMEM streaming) currently gates at
n >= 2048 — a bound chosen against the *canonical* short lengths, never
measured in the 768..2048 band.  This experiment XPlane-times a 3-layer
stage-0 stack under the three tiers:

  block  — fused attention block (current auto dispatch)
  xla    — fused_attention='never' (round-2 path)
  flash  — XLA path with ops.attention._use_flash patched to n >= 768

Usage: python benchmarks/exp_pit_attn.py [block xla flash]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, D, HEADS, DIM_HEAD, MLP = 64, 962, 256, 4, 64, 1024
DEPTH = 3


def build(tier):
    from vit_tpu.layers.common import Transformer
    from vit_tpu.ops import attention as att

    # Reset the dispatch before every tier: the 'flash' tier monkey-patches
    # it, and without the reset a later tier in the same process (any argv
    # order, e.g. 'flash xla') would silently measure the flash path.
    if not hasattr(build, "_orig_use_flash"):
        build._orig_use_flash = att._use_flash
    att._use_flash = build._orig_use_flash

    if tier == "flash":
        att._use_flash = lambda q, k, bias, mask: (
            max(q.shape[2], k.shape[2]) >= 768 and bias is None
            and mask is None)

    model = Transformer(
        dim=D, depth=DEPTH, heads=HEADS, dim_head=DIM_HEAD, mlp_dim=MLP,
        dtype=jnp.bfloat16,
        fused_attention="auto" if tier == "block" else "never")
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), x)
    fwd = jax.jit(lambda p, t: model.apply(p, t))
    ring = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, N, D),
                              jnp.bfloat16) for i in range(4)]

    def run(n):
        outs = [fwd(params, ring[i % len(ring)]) for i in range(n)]
        jax.block_until_ready(outs)

    return run


def main():
    from vit_tpu.utils.profiling import op_breakdown, trace

    tiers = sys.argv[1:] or ["block", "xla", "flash"]
    for tier in tiers:
        run = build(tier)
        t0 = time.perf_counter()
        run(3)  # compile + settle
        print(f"[{tier}] compile+settle {time.perf_counter() - t0:.1f}s",
              flush=True)
        logdir = f"/tmp/exp_pit_attn_{tier}"
        with trace(logdir):
            run(10)
        all_rows = op_breakdown(logdir, top=10 ** 6)
        rows = all_rows[:8]
        total = sum(r["total_ms"] for r in all_rows)
        print(f"== {tier}: {total / 10:.3f} ms/step device "
              f"({DEPTH} layers at ({B},{N},{D}) h{HEADS}) ==", flush=True)
        for r in rows:
            print(f"  {r['pct']:5.1f}%  {r['total_ms'] / 10:7.3f} ms/step  "
                  f"x{r['occurrences']:<4d} {r['name'][:90]}", flush=True)


if __name__ == "__main__":
    main()
