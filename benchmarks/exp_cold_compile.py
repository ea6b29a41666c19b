"""Cold-vs-warm compile_s table (VERDICT round-3 ask #4, second half).

For each named model this driver runs TWO subprocesses against the SAME
scratch compile-cache directory:

  cold   fresh empty VIT_TPU_CACHE_DIR — every XLA module and Mosaic
         kernel compiles from nothing (the remote tpu_compile_helper
         round-trips included);
  warm   second process, same dir — everything served from the cache.

The child measures time-to-first-result for the jitted inference step
(model.init excluded: param init is a separate, CPU-side cost).  One
model per process (HBM law); results append to results_compile.jsonl.

Usage:  python benchmarks/exp_cold_compile.py vit_b16_224 pit twins_svt ...
        python benchmarks/exp_cold_compile.py --child <name>   (internal)
"""

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)


def child(name):
    import jax
    import jax.numpy as jnp
    from run_benchmarks import (_extras, _more_models, _objectives,
                                _regionvit, model_registry)

    dtype = jnp.bfloat16
    registry = model_registry(dtype)
    registry["regionvit"] = _regionvit(dtype)
    registry.update(_extras(dtype))
    registry.update(_more_models(dtype))
    registry.update(_objectives(dtype))
    model, image_size = registry[name]
    batch = 64

    img = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, image_size, image_size, 3), dtype)
    variables = model.init(jax.random.PRNGKey(0), img)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    t0 = time.time()
    jax.block_until_ready(fwd(variables, img))
    print(json.dumps({"model": name, "compile_s": round(time.time() - t0, 1)}))


def main():
    if sys.argv[1] == "--child":
        return child(sys.argv[2])

    names = sys.argv[1:]
    out_path = os.path.join(HERE, "results_compile.jsonl")
    for name in names:
        scratch = tempfile.mkdtemp(prefix=f"coldcache_{name}_")
        row = {"model": name}
        for phase in ("cold", "warm"):
            env = dict(os.environ, VIT_TPU_CACHE_DIR=scratch)
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--child", name],
                env=env, capture_output=True, text=True, timeout=5400)
            wall = round(time.time() - t0, 1)
            try:
                comp = json.loads(p.stdout.strip().splitlines()[-1])
                row[f"{phase}_compile_s"] = comp["compile_s"]
            except Exception:
                row[f"{phase}_compile_s"] = None
                row[f"{phase}_error"] = (p.stderr or "")[-500:]
            row[f"{phase}_wall_s"] = wall
            print(f"{name} {phase}: compile_s={row.get(f'{phase}_compile_s')}"
                  f" wall={wall}s", flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
