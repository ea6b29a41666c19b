"""Does routing LSA through the fused attention-block kernel pay?

ViT-for-small-datasets (benchmark config: 256/16 -> n=257, dim 1024,
depth 6, heads 16, batch 64, bf16) runs its attention on the eager XLA
path: per layer it materializes the (64,16,257,257) f32 score map twice
(logits + softmax) plus the masked `where` — ~270 MB of HBM traffic per
materialization at a shape where the fused block kernel keeps scores in
VMEM.  `apply_fused_lsa_block` folds LSA's learnable temperature into
the wqkv operand and the diagonal self-mask into the kernel's additive
bias, so the standard block kernel applies unchanged.

One (flag) config per process; XPlane device totals only (the axon
tunnel memoizes identical executions).

Usage:  python benchmarks/exp_lsa_fused.py auto    # fused (new default)
        python benchmarks/exp_lsa_fused.py never   # eager baseline
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    flag = sys.argv[1]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vit_tpu import cast_params
    from vit_tpu.models import vit_for_small_dataset
    from vit_tpu.utils.profiling import op_breakdown, trace

    batch, image_size = 64, 256
    model = vit_for_small_dataset.ViT(
        image_size=image_size, patch_size=16, num_classes=1000, dim=1024,
        depth=6, heads=16, mlp_dim=2048, dtype=jnp.bfloat16,
        fused_attention=flag)

    img = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, image_size, image_size, 3), jnp.bfloat16)
    serve = cast_params(model.init(jax.random.PRNGKey(0), img), jnp.bfloat16)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    ring = [jax.random.normal(jax.random.PRNGKey(10 + i),
                              (batch, image_size, image_size, 3),
                              jnp.bfloat16) for i in range(4)]

    def run(n):
        outs = [fwd(serve, ring[i % len(ring)]) for i in range(n)]
        jax.block_until_ready(outs)

    run(5)  # compile + settle

    logdir = f"/tmp/vit_tpu_lsa_{flag}"
    with trace(logdir):
        run(10)

    rows = op_breakdown(logdir, top=200)
    total = sum(r["total_ms"] for r in rows)
    print(f"== small_dataset_vit fused_attention={flag}: XPlane device "
          f"{total / 10:.3f} ms/step (batch {batch}) ==")
    for r in rows[:12]:
        print(f"{r['pct']:5.1f}%  {r['total_ms']:8.3f} ms  "
              f"x{r['occurrences']:<4d} {r['name'][:100]}")


if __name__ == "__main__":
    main()
