"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): ViT-B/32 @256 fwd+bwd images/sec/chip on the
canonical reference config (reference vit.py:181-194: dim 1024, depth 6,
heads 16, mlp 2048).  Runs on the real chip with the production dtype policy
(bf16 compute / f32 params).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` reports
the fraction of the per-chip bf16 matmul roofline this run achieves
(analytic FLOP count / peak bf16 FLOPs for the detected TPU generation).
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import optax

# Persistent compile cache: repeat driver runs skip the remote compile.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def model_train_flops_per_image(image_size=256, patch=32, dim=1024, depth=6,
                                heads=16, dim_head=64, mlp_dim=2048,
                                num_classes=1000):
    n = (image_size // patch) ** 2 + 1  # +CLS
    patch_dim = patch * patch * 3
    inner = heads * dim_head
    fwd = (n - 1) * patch_dim * dim * 2  # patch embedding GEMM
    per_layer = (
        n * dim * (3 * inner) * 2        # qkv
        + 2 * heads * n * n * dim_head * 2  # q@k^T and attn@v
        + n * inner * dim * 2            # out proj
        + 2 * n * dim * mlp_dim * 2      # mlp
    )
    fwd += depth * per_layer + dim * num_classes * 2
    return 3 * fwd  # fwd + bwd ≈ 3× fwd FLOPs


def peak_bf16_flops():
    kind = jax.devices()[0].device_kind.lower()
    # Per-chip dense bf16 peaks (public specs).
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v4" in kind:
        return 275e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v6" in kind:
        return 918e12
    return 197e12


# Measured practical GEMM ceiling at the headline shapes (XPlane device
# time, v5e, round 2 — benchmarks/BENCHMARKS.md "Practical ceiling"):
# bare fc1+fc2 chain (12608x768x3072) = 193 TF/s (98% of analytic peak);
# qkv GEMM + fused LN (smaller K) = 175 TF/s.  The B/32 step's GEMM mix
# sits between those anchors; 184 TF/s is the midpoint.  vs_practical
# divides by this instead of the 197 TF/s analytic peak the hardware
# never reaches at these shapes.
PRACTICAL_GEMM_FLOPS_V5E = 184e12


def practical_bf16_flops():
    return peak_bf16_flops() * (PRACTICAL_GEMM_FLOPS_V5E / 197e12)


def main():
    from vit_tpu import ViT
    from vit_tpu.parallel.train import cross_entropy_loss

    batch = 128
    model = ViT(
        image_size=256, patch_size=32, num_classes=1000,
        dim=1024, depth=6, heads=16, mlp_dim=2048,
        dtype=jnp.bfloat16,
    )
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.bfloat16)
    labels = jnp.arange(batch) % 1000
    params = model.init(jax.random.PRNGKey(0), img)
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, img, labels):
        def loss_fn(p):
            return cross_entropy_loss(model.apply(p, img), labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # Compile + settle (first post-compile steps can be anomalously timed on
    # the remote-compile path; force a host transfer to anchor each phase).
    for _ in range(5):
        params, opt_state, loss = train_step(params, opt_state, img, labels)
    float(loss)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = train_step(params, opt_state, img, labels)
    float(loss)  # host transfer: guarantees every queued step retired
    dt = (time.perf_counter() - t0) / iters
    wall_imgs_per_sec = batch / dt

    # Headline = XPlane device time.  Wall clocks on this box's remote-chip
    # tunnel carry ~2 ms/step of dispatch latency that is an artifact of the
    # tunnel, not of the program (BENCHMARKS.md "measurement law": trust only
    # XPlane device timestamps).  The wall number is kept as a cross-check
    # field; if profiling is unavailable the wall number is the headline.
    device_ms = None
    try:
        import shutil
        import tempfile

        from vit_tpu.utils.profiling import op_breakdown, trace

        logdir = tempfile.mkdtemp(prefix="vit_bench_xplane_")
        try:
            prof_iters = 10
            with trace(logdir):
                for _ in range(prof_iters):
                    params, opt_state, loss = train_step(
                        params, opt_state, img, labels)
                float(loss)
            rows = op_breakdown(logdir, top=1_000_000)
            total = sum(r["total_ms"] for r in rows)
            if total > 0:
                device_ms = total / prof_iters
        finally:
            shutil.rmtree(logdir, ignore_errors=True)
    except Exception:
        device_ms = None

    if device_ms is not None:
        imgs_per_sec = batch / (device_ms / 1e3)
        method = ("XPlane device time over 10 steps; "
                  "wall-clock cross-check in wall_images_per_sec")
    else:
        imgs_per_sec = wall_imgs_per_sec
        method = "wall clock over 30 chained steps (XPlane unavailable)"

    # vs_floor: fraction of the MEASURED shape-aware GEMM floor this step
    # achieves (benchmarks/floors.json, from exp_b32_floor.py's depth-diff
    # decomposition — see BENCHMARKS.md "B/32 TRAIN floor accounting").
    # Unlike vs_analytic/vs_practical, the denominator is the sum of this
    # exact step's own GEMMs measured standalone on this chip, so 1.0 means
    # "every non-GEMM op is free"; >0.93 is at-floor given the ~15 VPU/HBM
    # passes per layer the model's math requires.
    vs_floor = None
    floor_ms = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "floors.json")) as f:
            floor_ms = json.load(f)["b32_train_step_floor_ms"]
        step_ms = device_ms if device_ms is not None else dt * 1e3
        vs_floor = round(floor_ms / step_ms, 3)
    except Exception:
        pass

    flops = model_train_flops_per_image()
    analytic = peak_bf16_flops() / flops
    practical = practical_bf16_flops() / flops
    print(json.dumps({
        "metric": "ViT-B/32 @256 fwd+bwd images/sec/chip (batch=128, bf16)",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / analytic, 3),
        "vs_analytic": round(imgs_per_sec / analytic, 3),
        "vs_practical": round(imgs_per_sec / practical, 3),
        "vs_floor": vs_floor,
        "floor_ms_per_step": floor_ms,
        "wall_images_per_sec": round(wall_imgs_per_sec, 1),
        "method": method,
        "practical_ceiling_note": "184 TF/s measured all-GEMM ceiling at "
                                  "these shapes (XPlane; BENCHMARKS.md)",
    }))


def _retry_fresh_process(exc):
    """One retry in a brand-new process.  Round 1's artifact died to a
    transient libtpu client/terminal mismatch naming stale AOT executables —
    a fresh client with a cold cache recovers that failure class, so the
    persistent cache is cleared ONLY for it.  When the backend is simply
    unreachable (the axon tunnel's claim/remote-compile relay down —
    ``UNAVAILABLE`` init errors), clearing ~3 GB of warm compiles cannot
    help and would cost the next session hours of recompiles; retry with
    the cache intact."""
    import shutil
    import subprocess
    import sys

    msg = f"{type(exc).__name__}: {exc}"
    tunnel_down = "UNAVAILABLE" in msg or "Unable to initialize backend" in msg
    if not tunnel_down:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        shutil.rmtree(cache, ignore_errors=True)
    env = dict(os.environ, VIT_TPU_BENCH_RETRY="1")
    raise SystemExit(subprocess.call([sys.executable, os.path.abspath(__file__)], env=env))


if __name__ == "__main__":
    if os.environ.get("VIT_TPU_BENCH_RETRY"):
        main()
    else:
        try:
            main()
        except Exception as exc:
            import traceback

            traceback.print_exc()
            _retry_fresh_process(exc)
