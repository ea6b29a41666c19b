"""Does a space-to-depth rewrite fix the CrossFormer fused stem?

`profiles/crossformer.md` (round 5) names the fused k=32/s=4 stem conv as
the step's largest single op: 2.50 ms at ~31 TF/s — XLA's conv emitter
pays N=64 lane underfill x stride-4 overlapping-window im2col.  Its GEMM
bound (M=64*56*56, K=32*32*3, N=64) is ~0.43 ms at the 184 TF/s ceiling.

The rewrite: because K % s == 0, pad the image once with the conv's own
(pad_lo, pad_hi), space-to-depth by the stride (224^2*3 -> 63^2*48 with
channels packed (ry, rx, c)), and reindex the fused kernel the same way
((32,32,3,64) -> (8,8,48,64)).  The k=8/s=1/cin=48 conv computes the
IDENTICAL sums — same taps, same f32 accumulation targets — but gives
XLA a stride-1 conv with 16x deeper input channels to feed the MXU.

One (model, flag) config per process; only XPlane device totals are
trusted (the axon tunnel memoizes identical executions).

Usage:  python benchmarks/exp_s2d_stem.py crossformer 1
        python benchmarks/exp_s2d_stem.py crossformer 0
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    name, flag = sys.argv[1], sys.argv[2]
    os.environ["VIT_TPU_S2D_STEM"] = flag

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from profile_step import model_run
    from vit_tpu.utils.profiling import op_breakdown, trace

    run, batch = model_run(name, "infer")
    run(5)  # compile + settle

    logdir = f"/tmp/vit_tpu_s2d_{name}_{flag}"
    with trace(logdir):
        run(10)

    rows = op_breakdown(logdir, top=200)
    total = sum(r["total_ms"] for r in rows)
    print(f"== {name} s2d_stem={flag}: XPlane device {total / 10:.3f} "
          f"ms/step (batch {batch}) ==")
    for r in rows[:12]:
        print(f"{r['pct']:5.1f}%  {r['total_ms']:8.3f} ms  "
              f"x{r['occurrences']:<4d} {r['name'][:100]}")


if __name__ == "__main__":
    main()
