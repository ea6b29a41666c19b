"""Does the fused conv-MLP kernel win at model dim 64?

The round-4 twins_svt XPlane trace shows the stage-1 (c=64) conv-MLPs
running in XLA — fc1 alone is 0.93 ms/step (7 TF/s: it writes the
(64,56,56,256) hidden map to HBM) plus separate ChannelLN reduce and
fc2+residual fusions.  They run in XLA only because the fused-MLP
dispatch gates on ``x.shape[-1] >= 128`` (one full lane tile), a floor
set for T2T's 27/147-dim stages.  CrossFormer stage 1 (dim 64, 4 MLPs
per step — the "4 x 0.87 ms residual add fusions" of
profiles/crossformer.md) has the same shape.

This experiment measures one (model, min_d) config per process —
the axon tunnel memoizes identical executions, so only XPlane device
totals are trusted.

Usage:  python benchmarks/exp_cmlp64.py twins_svt 128
        python benchmarks/exp_cmlp64.py twins_svt 64
        python benchmarks/exp_cmlp64.py crossformer 128
        python benchmarks/exp_cmlp64.py crossformer 64
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    name, min_d = sys.argv[1], sys.argv[2]
    os.environ["VIT_TPU_FUSED_MLP_MIN_D"] = min_d

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from profile_step import model_run
    from vit_tpu.utils.profiling import op_breakdown, trace

    run, batch = model_run(name, "infer")
    run(5)  # compile + settle

    logdir = f"/tmp/vit_tpu_cmlp64_{name}_{min_d}"
    with trace(logdir):
        run(10)

    rows = op_breakdown(logdir, top=200)
    total = sum(r["total_ms"] for r in rows)
    print(f"== {name} min_d={min_d}: XPlane device {total / 10:.3f} ms/step "
          f"(batch {batch}) ==")
    for r in rows[:12]:
        print(f"{r['pct']:5.1f}%  {r['total_ms']:8.3f} ms  "
              f"x{r['occurrences']:<4d} {r['name'][:100]}")


if __name__ == "__main__":
    main()
