"""B/16 per-op floor accounting (VERDICT r3 #1b).

Decomposes the ViT-B/16 @224 batch-64 bf16 inference step into its two
kernel classes and measures each STANDALONE, next to bare-GEMM floors of
exactly the matmuls each kernel contains.  The resulting table (published
in BENCHMARKS.md) makes the roofline gap additive: step ≈ 12·(attn block
+ MLP block) + embed + head, and each kernel row sits beside the sum of
its GEMMs at measured standalone rates.

Tiers (XPlane device time, ring of 4 distinct inputs):
  attn       fused_attention_block (64,197,768) h12 dh64
  mlp        fused_mlp (64,197,768) -> 3072
  gemm_qkv   (12608,768)@(768,2304)
  gemm_wo    (12608,768)@(768,768)
  gemm_fc1   (12608,768)@(768,3072)
  gemm_fc2   (12608,3072)@(3072,768)
  gemm_attn  batched per-head dots (768,197,64): scores + apply
  embed      (12544,768)@(768,768) patch embedding
  head       (64,768)@(768,1000)

Usage: python benchmarks/exp_b16_floor.py [tier ...]   (default: all)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, D, HEADS, DH, MLP = 64, 197, 768, 12, 64, 3072
T = B * N  # 12608 token rows
ITERS = 20


def _gemm(m, k, n):
    def fn(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)

    jfn = jax.jit(fn)
    rings = [(jax.random.normal(jax.random.PRNGKey(10 + i), (m, k),
                                jnp.bfloat16),
              jax.random.normal(jax.random.PRNGKey(50 + i), (k, n),
                                jnp.bfloat16)) for i in range(4)]
    flops = 2 * m * k * n
    return jfn, rings, flops


def build(tier):
    key = jax.random.PRNGKey(0)
    if tier == "attn":
        from vit_tpu.ops.fused_attention_block import fused_attention_block

        ks = jax.random.split(key, 6)
        gamma = jnp.ones((D,), jnp.float32)
        beta = jnp.zeros((D,), jnp.float32)
        wqkv = jax.random.normal(ks[0], (D, 3 * HEADS * DH),
                                 jnp.bfloat16) * 0.02
        wo = jax.random.normal(ks[1], (HEADS * DH, D), jnp.bfloat16) * 0.02
        bo = jnp.zeros((D,), jnp.bfloat16)
        fn = jax.jit(lambda x: fused_attention_block(
            x, gamma, beta, wqkv, wo, bo, HEADS, DH))
        rings = [(jax.random.normal(jax.random.PRNGKey(10 + i), (B, N, D),
                                    jnp.bfloat16),) for i in range(4)]
        flops = 2 * T * D * 4 * HEADS * DH + 4 * B * HEADS * N * N * DH
        return fn, rings, flops
    if tier == "mlp":
        from vit_tpu.ops.fused_mlp import fused_mlp

        ks = jax.random.split(key, 2)
        gamma = jnp.ones((D,), jnp.float32)
        beta = jnp.zeros((D,), jnp.float32)
        w1 = jax.random.normal(ks[0], (D, MLP), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((MLP,), jnp.bfloat16)
        w2 = jax.random.normal(ks[1], (MLP, D), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((D,), jnp.bfloat16)
        fn = jax.jit(lambda x: fused_mlp(x, gamma, beta, w1, b1, w2, b2))
        rings = [(jax.random.normal(jax.random.PRNGKey(10 + i), (B, N, D),
                                    jnp.bfloat16),) for i in range(4)]
        flops = 2 * T * D * 2 * MLP
        return fn, rings, flops
    if tier == "gemm_attn":
        def fn(q, k, v):
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            return jax.lax.dot_general(
                s.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        jfn = jax.jit(fn)
        rings = []
        for i in range(4):
            ks = jax.random.split(jax.random.PRNGKey(10 + i), 3)
            rings.append(tuple(jax.random.normal(
                kk, (B * HEADS, N, DH), jnp.bfloat16) for kk in ks))
        flops = 4 * B * HEADS * N * N * DH
        return jfn, rings, flops
    dims = {"gemm_qkv": (T, D, 3 * HEADS * DH), "gemm_wo": (T, HEADS * DH, D),
            "gemm_fc1": (T, D, MLP), "gemm_fc2": (T, MLP, D),
            "embed": (B * 196, 768, D), "head": (B, D, 1000)}
    return _gemm(*dims[tier])


def device_ms_per_call(fn, rings, tag):
    from vit_tpu.utils.profiling import op_breakdown, trace

    def run(iters):
        outs = [fn(*rings[i % len(rings)]) for i in range(iters)]
        jax.block_until_ready(outs)

    run(4)
    logdir = f"/tmp/exp_b16_floor_{tag}"
    with trace(logdir):
        run(ITERS)
    rows = op_breakdown(logdir, top=200)
    return sum(r["total_ms"] for r in rows) / ITERS


def main():
    tiers = sys.argv[1:] or ["attn", "mlp", "gemm_qkv", "gemm_wo",
                             "gemm_fc1", "gemm_fc2", "gemm_attn", "embed",
                             "head"]
    results = {}
    for tier in tiers:
        fn, rings, flops = build(tier)
        ms = device_ms_per_call(fn, rings, tier)
        results[tier] = ms
        print(f"== {tier}: {ms:.4f} ms/call device = "
              f"{flops / ms / 1e9:.1f} TF/s ==", flush=True)

    if all(t in results for t in ("attn", "mlp", "gemm_qkv", "gemm_wo",
                                  "gemm_attn", "gemm_fc1", "gemm_fc2",
                                  "embed", "head")):
        attn_floor = (results["gemm_qkv"] + results["gemm_wo"]
                      + results["gemm_attn"])
        mlp_floor = results["gemm_fc1"] + results["gemm_fc2"]
        print(f"\nattention block: {results['attn']:.4f} ms vs "
              f"GEMM floor {attn_floor:.4f} ms "
              f"(+{(results['attn'] / attn_floor - 1) * 100:.1f}%)")
        print(f"MLP block:       {results['mlp']:.4f} ms vs "
              f"GEMM floor {mlp_floor:.4f} ms "
              f"(+{(results['mlp'] / mlp_floor - 1) * 100:.1f}%)")
        step = 12 * (results["attn"] + results["mlp"]) \
            + results["embed"] + results["head"]
        floor = 12 * (attn_floor + mlp_floor) \
            + results["embed"] + results["head"]
        print(f"kernel-sum step: {step:.3f} ms; GEMM-floor step: "
              f"{floor:.3f} ms")


if __name__ == "__main__":
    main()
