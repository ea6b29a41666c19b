"""B/32 TRAIN per-op floor accounting (round 4).

The bench.py headline (ViT-B/32 @256 batch-128 bf16 fwd+bwd) sits at
0.584 analytic / 0.625 practical roofline.  exp_b16_floor.py settled the
B/16 question by putting each kernel next to its bare-GEMM floor; this
experiment does the same for the TRAIN headline, with a twist that makes
the decomposition exact instead of synthetic:

  depth-diff:  measure the REAL bench.py train step at depth 6 and
               depth 3.  Both share the embed/head/loss/optimizer
               overhead, so  per_layer = (t6 - t3) / 3  and
               overhead = 2*t3 - t6  — per-layer cost including every
               layout/fusion effect the standalone-block method misses.

  GEMM floors: each layer matmul and its two backward GEMMs measured
               standalone (bf16 operands, f32 accumulate — the model's
               own precision policy), plus the batched attention dots.
               Attention backward runs 4 dots of the same shape family
               as the 2 forward dots; its floor is taken as 2x the
               measured forward pair (noted, not hidden).

Non-GEMM floor items itemized analytically (printed): SGD update HBM
traffic (3 passes over ~53M f32 params ~= 0.6 GB at the v5e's ~800 GB/s)
and the softmax/LN/GELU VPU passes.

Tiers (XPlane device time, ring of 4 distinct inputs):
  model6 / model3   full train step, depth 6 / 3 (batch 128)
  g_qkv     (8320,1024)@(1024,3072)      g_qkv_dx  (8320,3072)@(3072,1024)
  g_dw_qkv  (1024,8320)@(8320,3072)      g_wo      (8320,1024)@(1024,1024)
  g_dw_wo   (1024,8320)@(8320,1024)      g_fc1     (8320,1024)@(1024,2048)
  g_fc2     (8320,2048)@(2048,1024)      g_dw_fc1  (1024,8320)@(8320,2048)
  g_dw_fc2  (2048,8320)@(8320,1024)      attn_dots batched (2048,65,64) scores+apply
  embed     (8192,3072)@(3072,1024)      g_dw_embed (3072,8192)@(8192,1024)
  head      (128,1024)@(1024,1000)

Usage: python benchmarks/exp_b32_floor.py [tier ...]   (default: all)
One invocation per process (measurement law: the tunnel memoizes, and
model6/model3 each deserve a quiet box) is NOT required here — tiers are
independent jits — but run it on an idle box.
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

B, N, D, HEADS, DH, MLP = 128, 65, 1024, 16, 64, 2048
T = B * N          # 8320 token rows
P = B * 64         # 8192 patch rows
PATCH_DIM = 32 * 32 * 3
ITERS = 20
MODEL_ITERS = 10


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
    return jfn, rings


def _model(depth):
    import optax

    from vit_tpu import ViT
    from vit_tpu.parallel.train import cross_entropy_loss

    model = ViT(image_size=256, patch_size=32, num_classes=1000,
                dim=D, depth=depth, heads=HEADS, mlp_dim=MLP,
                dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(1), (B, 256, 256, 3),
                            jnp.bfloat16)
    labels = jnp.arange(B) % 1000
    params = model.init(jax.random.PRNGKey(0), img)
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, img, labels):
        def loss_fn(p):
            return cross_entropy_loss(model.apply(p, img), labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rings = [jax.random.normal(jax.random.PRNGKey(10 + i),
                               (B, 256, 256, 3), jnp.bfloat16)
             for i in range(4)]

    state = {"params": params, "opt": opt_state}

    def fn(i):
        state["params"], state["opt"], loss = train_step(
            state["params"], state["opt"], rings[i % 4], labels)
        return loss

    return fn


def build(tier):
    if tier in ("model6", "model3"):
        return _model(6 if tier == "model6" else 3), None
    if tier == "attn_dots":
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
        return jfn, rings
    dims = {
        "g_qkv": (T, D, 3 * HEADS * DH), "g_qkv_dx": (T, 3 * HEADS * DH, D),
        "g_dw_qkv": (D, T, 3 * HEADS * DH),
        "g_wo": (T, D, D), "g_dw_wo": (D, T, D),
        "g_fc1": (T, D, MLP), "g_fc2": (T, MLP, D),
        "g_dw_fc1": (D, T, MLP), "g_dw_fc2": (MLP, T, D),
        "embed": (P, PATCH_DIM, D), "g_dw_embed": (PATCH_DIM, P, D),
        "head": (B, D, 1000),
    }
    jfn, rings = _gemm(*dims[tier])
    return jfn, rings


def device_ms_per_call(fn, rings, tag, iters):
    from vit_tpu.utils.profiling import op_breakdown, trace

    def run(n):
        if rings is None:
            outs = [fn(i) for i in range(n)]
        else:
            outs = [fn(*rings[i % len(rings)]) for i in range(n)]
        jax.block_until_ready(outs)

    run(4)
    logdir = f"/tmp/exp_b32_floor_{tag}"
    with trace(logdir):
        run(iters)
    rows = op_breakdown(logdir, top=1_000_000)
    return sum(r["total_ms"] for r in rows) / iters


ALL = ["model6", "model3", "g_qkv", "g_qkv_dx", "g_dw_qkv", "g_wo",
       "g_dw_wo", "g_fc1", "g_fc2", "g_dw_fc1", "g_dw_fc2", "attn_dots",
       "embed", "g_dw_embed", "head"]


def main():
    tiers = sys.argv[1:] or ALL
    results = {}
    for tier in tiers:
        fn, rings = build(tier)
        iters = MODEL_ITERS if tier.startswith("model") else ITERS
        ms = device_ms_per_call(fn, rings, tier, iters)
        results[tier] = ms
        print(f"== {tier}: {ms:.4f} ms/call device ==", flush=True)

    if all(t in results for t in ALL):
        t6, t3 = results["model6"], results["model3"]
        per_layer = (t6 - t3) / 3
        overhead = 2 * t3 - t6
        # fwd dx paths: fc1_dx has fc2's fwd shape and vice versa; wo_dx has
        # wo's own shape.
        layer_floor = (results["g_qkv"] + results["g_qkv_dx"]
                       + results["g_dw_qkv"]
                       + 2 * results["g_wo"] + results["g_dw_wo"]
                       + results["g_fc1"] + results["g_fc2"]
                       + results["g_dw_fc1"] + results["g_dw_fc2"]
                       + results["g_fc2"] + results["g_fc1"]  # dx mirrors
                       + 3 * results["attn_dots"])  # 2 fwd + 4 bwd dots
        ovh_floor = (results["embed"] + results["g_dw_embed"]
                     + 2 * results["head"])
        # SGD non-GEMM floor: 3 HBM passes over ~53M f32 params.
        params_gb = 53e6 * 4 * 3 / 1e9
        sgd_ms = params_gb / 800e9 * 1e12
        print(f"\nper-layer fwd+bwd (depth-diff): {per_layer:.4f} ms vs "
              f"GEMM floor {layer_floor:.4f} ms "
              f"(+{(per_layer / layer_floor - 1) * 100:.1f}%)")
        print(f"non-layer overhead (2*t3-t6): {overhead:.4f} ms vs "
              f"embed/head GEMM floor {ovh_floor:.4f} ms "
              f"+ SGD HBM ~{sgd_ms:.2f} ms")
        print(f"step check: 6*per_layer + overhead = "
              f"{6 * per_layer + overhead:.3f} ms (model6 measured {t6:.3f})")
        print(f"GEMM-floor step: 6*{layer_floor:.4f} + {ovh_floor:.4f} "
              f"+ {sgd_ms:.2f} = "
              f"{6 * layer_floor + ovh_floor + sgd_ms:.3f} ms")


if __name__ == "__main__":
    main()
