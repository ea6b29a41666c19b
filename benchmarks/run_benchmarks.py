"""Benchmark matrix — BASELINE.json "configs" on the real chip.

Measures steady-state throughput (images/sec/chip) for inference and
fwd+bwd training steps, in the production dtype policy (bf16 compute).
Writes one JSON line per entry to benchmarks/results.jsonl.

Usage:
    python benchmarks/run_benchmarks.py [--only vit,cait,...] [--batch 64]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

# Persistent compile cache (same as bench.py): repeat runs skip the remote
# compile — essential on this box where big fused-model compiles are slow.
# VIT_TPU_CACHE_DIR overrides (point at an empty dir to measure a COLD
# compile honestly without clobbering the warm cache).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VIT_TPU_CACHE_DIR") or
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def model_registry(dtype):
    from vit_tpu import (CaiT, CrossFormer, CrossViT, DeepViT, LeViT,
                         MobileViT, NesT, PiT, T2TViT, TwinsSVT, ViT)

    return {
        # headline config: reference vit.py usage block
        "vit_b32_256": (ViT(image_size=256, patch_size=32, num_classes=1000,
                            dim=1024, depth=6, heads=16, mlp_dim=2048,
                            dtype=dtype), 256),
        "vit_b16_224": (ViT(image_size=224, patch_size=16, num_classes=1000,
                            dim=768, depth=12, heads=12, mlp_dim=3072,
                            dtype=dtype), 224),
        "deepvit": (DeepViT(image_size=256, patch_size=32, num_classes=1000,
                            dim=1024, depth=6, heads=16, mlp_dim=2048,
                            dtype=dtype), 256),
        "cait": (CaiT(image_size=256, patch_size=32, num_classes=1000,
                      dim=1024, depth=12, cls_depth=2, heads=16,
                      mlp_dim=2048, dtype=dtype), 256),
        "t2t": (T2TViT(image_size=224, num_classes=1000, dim=512, depth=5,
                       heads=8, mlp_dim=512, dtype=dtype), 224),
        "pit": (PiT(image_size=224, patch_size=14, num_classes=1000, dim=256,
                    depth=(3, 3, 3), heads=16, mlp_dim=2048, dtype=dtype), 224),
        "nest": (NesT(image_size=224, patch_size=4, num_classes=1000, dim=96,
                      heads=3, num_hierarchies=3, block_repeats=(2, 2, 8),
                      dtype=dtype), 224),
        "levit": (LeViT(image_size=224, num_classes=1000, stages=3,
                        dim=(256, 384, 512), depth=4, heads=(4, 6, 8),
                        mlp_mult=2, dtype=dtype), 224),
        "twins_svt": (TwinsSVT(num_classes=1000, dtype=dtype), 224),
        "crossformer": (CrossFormer(num_classes=1000, dtype=dtype), 224),
        "regionvit": (None, 224),  # filled below (constructor kwargs differ)
        "mobilevit": (MobileViT(image_size=(256, 256), dims=[96, 120, 144],
                                channels=[16, 32, 48, 48, 64, 64, 80, 80,
                                          96, 96, 384],
                                num_classes=1000, dtype=dtype), 256),
        "cross_vit": (CrossViT(image_size=256, num_classes=1000, sm_dim=192,
                               lg_dim=384, sm_patch_size=16, lg_patch_size=64,
                               sm_enc_depth=2, lg_enc_depth=3, depth=4,
                               dropout=0.0, emb_dropout=0.0, dtype=dtype), 256),
    }


def _regionvit(dtype):
    from vit_tpu import RegionViT

    return RegionViT(num_classes=1000, dtype=dtype), 224


def _more_models(dtype):
    from vit_tpu import CvT
    from vit_tpu.layers.common import Transformer
    from vit_tpu.models import efficient, parallel_vit

    return {
        "cvt": (CvT(num_classes=1000, dtype=dtype), 224),
        # efficient-ViT: the injectable-encoder variant with the canonical
        # encoder config (reference efficient.py usage block)
        "efficient_vit": (efficient.ViT(
            image_size=256, patch_size=32, num_classes=1000, dim=1024,
            transformer=Transformer(1024, 6, 16, 64, 2048, dtype=dtype),
            dtype=dtype), 256),
        "parallel_vit": (parallel_vit.ViT(
            image_size=256, patch_size=32, num_classes=1000, dim=1024,
            depth=6, heads=8, mlp_dim=2048, num_parallel_branches=2,
            dtype=dtype), 256),
    }


def _objectives(dtype):
    """BASELINE.md workload 5: the objective-wrapper train steps on the
    canonical encoder (reference mae.py:94-114, simmim.py:133-150,
    mpp.py:221-240, distill.py:140-164 usage blocks)."""
    from vit_tpu import MAE, MPP, SimMIM, ViT
    from vit_tpu.objectives.distill import DistillableViT, DistillWrapper

    enc = lambda: ViT(image_size=256, patch_size=32, num_classes=1000,
                      dim=1024, depth=6, heads=8, mlp_dim=2048, dtype=dtype)
    teacher = ViT(image_size=256, patch_size=32, num_classes=1000,
                  dim=1024, depth=6, heads=8, mlp_dim=2048, dtype=dtype)
    student = DistillableViT(image_size=256, patch_size=32, num_classes=1000,
                             dim=1024, depth=6, heads=8, mlp_dim=2048,
                             dtype=dtype)
    return {
        "mae_obj": (MAE(image_size=256, encoder=enc(), decoder_dim=512,
                        masking_ratio=0.75, decoder_depth=6, dtype=dtype), 256),
        "simmim_obj": (SimMIM(image_size=256, encoder=enc(),
                              masking_ratio=0.5, dtype=dtype), 256),
        "mpp_obj": (MPP(image_size=256, transformer=enc(), patch_size=32,
                        dtype=dtype), 256),
        "distill_obj": (DistillWrapper(teacher=teacher, student=student,
                                       dtype=dtype), 256),
    }


def _extras(dtype):
    from vit_tpu import CCT, ScalableViT
    from vit_tpu.models import ats_vit, vit_for_small_dataset,         vit_with_patch_merger

    return {
        "cct_14": (CCT(img_size=224, embedding_dim=384, n_conv_layers=2,
                       kernel_size=7, stride=2, num_layers=14, num_heads=6,
                       mlp_ratio=3.0, num_classes=1000,
                       positional_embedding="learnable", dtype=dtype), 224),
        "scalable_vit": (ScalableViT(
            num_classes=1000, dim=64, heads=(2, 4, 8, 16),
            depth=(2, 2, 8, 2), ssa_dim_key=(40, 40, 40, 32),
            reduction_factor=(8, 4, 2, 1), window_size=(64, 32, None, None),
            dtype=dtype), 256),
        "ats_vit": (ats_vit.ViT(
            image_size=256, patch_size=16, num_classes=1000, dim=1024,
            depth=6, max_tokens_per_depth=(256, 128, 64, 32, 16, 8),
            heads=16, mlp_dim=2048, dtype=dtype), 256),
        "small_dataset_vit": (vit_for_small_dataset.ViT(
            image_size=256, patch_size=16, num_classes=1000, dim=1024,
            depth=6, heads=16, mlp_dim=2048, dtype=dtype), 256),
        "patch_merger_vit": (vit_with_patch_merger.ViT(
            image_size=256, patch_size=16, num_classes=1000, dim=1024,
            depth=12, heads=8, patch_merge_layer=6, mlp_dim=2048,
            dtype=dtype), 256),
    }


def bench_objective(name, model, image_size, batch, dtype, xplane=False):
    """Objective wrappers *are* the loss — the train step differentiates
    their scalar output directly."""
    from vit_tpu.utils.profiling import benchmark_throughput

    img = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, image_size, image_size, 3), dtype)
    labels = jnp.arange(batch) % 1000
    inputs = (img, labels) if name.startswith("distill") else img
    variables = model.init(jax.random.PRNGKey(0), inputs)

    tx = optax.sgd(1e-3)
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, inputs):
        loss, grads = jax.value_and_grad(
            lambda v: model.apply(v, inputs))(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    state = [variables, opt_state]

    def step_fn():
        state[0], state[1], loss = train_step(state[0], state[1], inputs)
        return loss

    train = benchmark_throughput(step_fn, batch=batch)
    row = {
        "model": name,
        "batch": batch,
        "image_size": image_size,
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "train_images_per_sec_per_chip": round(train["items_per_sec"], 1),
        "device": jax.devices()[0].device_kind,
    }
    if xplane:
        # Train steps update params every call — each enqueued execution is
        # already distinct, so no input ring is needed for the XPlane pass.
        xp = _xplane_step_ms(step_fn)
        row["train_device_ms_per_step"] = round(xp, 2)
        row["train_images_per_sec_device"] = round(batch / (xp / 1e3), 1)
    return row


def _xplane_step_ms(step_fn, iters=8):
    """Device ms/step for an arbitrary step closure straight from XPlane
    timestamps — the only timing source the axon tunnel can't distort
    (ROUND2_NOTES)."""
    import shutil
    import tempfile

    from vit_tpu.utils import profiling

    logdir = tempfile.mkdtemp(prefix="vit_xp_")
    try:
        with profiling.trace(logdir):
            outs = [step_fn() for _ in range(iters)]
            jax.block_until_ready(outs)
        rows = profiling.op_breakdown(logdir, top=1_000_000)
        return sum(r["total_ms"] for r in rows) / iters
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def _xplane_infer_ms(fwd, serve_vars, ring, iters=8):
    ctr = [0]

    def step():
        out = fwd(serve_vars, ring[ctr[0] % len(ring)])
        ctr[0] += 1
        return out

    return _xplane_step_ms(step, iters)


def bench_model(name, model, image_size, batch, dtype, xplane=False):
    from vit_tpu.parallel.train import cross_entropy_loss
    from vit_tpu.utils.profiling import benchmark_throughput

    img = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, image_size, image_size, 3), dtype)
    labels = jnp.arange(batch) % 1000
    variables = model.init(jax.random.PRNGKey(0), img)
    has_bn = "batch_stats" in variables

    # Serving setup for the inference row: weights pre-cast to the compute
    # dtype once (per-step f32→bf16 converts cost 0.4 ms/step on B/16).
    from vit_tpu import cast_params
    serve_vars = cast_params(variables, dtype)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    # Measurement law (ROUND2_NOTES): the axon tunnel memoizes repeated
    # IDENTICAL executions — wall-clocking one fixed (vars, img) pair
    # under-reports.  Rotate a ring of distinct pre-generated batches so
    # every enqueued step is a genuinely new execution.
    ring = [jax.random.normal(jax.random.PRNGKey(10 + i),
                              (batch, image_size, image_size, 3), dtype)
            for i in range(4)]
    ctr = [0]

    def infer_fn():
        out = fwd(serve_vars, ring[ctr[0] % len(ring)])
        ctr[0] += 1
        return out

    infer = benchmark_throughput(infer_fn, batch=batch)
    xp_ms = _xplane_infer_ms(fwd, serve_vars, ring) if xplane else None

    tx = optax.sgd(1e-3)
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, img, labels):
        def loss_fn(v):
            if has_bn:
                # training=True: time the batch-stats BN path a real train
                # step uses (round-2 rows mislabelled this as training).
                out, _ = model.apply(v, img, training=True,
                                     mutable=["batch_stats"])
            else:
                out = model.apply(v, img)
            if isinstance(out, tuple):
                out = out[0]
            return cross_entropy_loss(out, labels)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    state = [variables, opt_state]

    def step_fn():
        state[0], state[1], loss = train_step(state[0], state[1], img, labels)
        return loss

    # The train compile is the biggest program the remote compile helper
    # sees (fwd+bwd+SGD, all fused-kernel custom VJPs); on this box it is
    # the one that dies (HTTP 500 after ~20 min on twins_svt, 2026-08-20
    # 04:54, idle box).  Don't let a dead train compile discard the infer
    # numbers already measured above — emit a partial row instead.
    train_error = None
    try:
        train = benchmark_throughput(step_fn, batch=batch)
        xp_train = _xplane_step_ms(step_fn) if xplane else None
    except Exception as e:
        train, xp_train, train_error = None, None, str(e)[:200]
    row = {
        "model": name,
        "batch": batch,
        "image_size": image_size,
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "infer_images_per_sec_per_chip": round(infer["items_per_sec"], 1),
        "device": jax.devices()[0].device_kind,
    }
    if train is not None:
        row["train_images_per_sec_per_chip"] = round(train["items_per_sec"], 1)
    if train_error is not None:
        row["train_error"] = train_error
    if xp_ms is not None:
        row["infer_device_ms_per_step"] = round(xp_ms, 2)
        row["infer_images_per_sec_device"] = round(batch / (xp_ms / 1e3), 1)
    if xp_train is not None:
        row["train_device_ms_per_step"] = round(xp_train, 2)
        row["train_images_per_sec_device"] = round(batch / (xp_train / 1e3),
                                                   1)
    return row


# Per-model batch caps (HBM).  Round 2 capped scalable_vit at 16 (the
# whole-map stage-1 IWSA materialized f32 (b, h, 4096, 4096) score maps);
# the flash routing + fused SSA cross-attention block lifted that — the
# standard batch 64 now fits.
_BATCH_OVERRIDES = {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--xplane", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="cross-check infer rows against XPlane device time "
                         "(on by default; --no-xplane for a quick pass)")
    args = ap.parse_args()

    try:
        import subprocess
        git_rev = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip() or None
    except Exception:
        git_rev = None

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    registry = model_registry(dtype)
    registry["regionvit"] = _regionvit(dtype)
    registry.update(_extras(dtype))
    registry.update(_more_models(dtype))
    registry.update(_objectives(dtype))
    names = (args.only.split(",") if args.only else list(registry))

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results.jsonl")
    with open(out_path, "a") as f:
        for name in names:
            model, image_size = registry[name]
            t0 = time.time()
            try:
                if name.endswith("_obj"):
                    row = bench_objective(name, model, image_size,
                                          _BATCH_OVERRIDES.get(name, args.batch),
                                          dtype, xplane=args.xplane)
                else:
                    row = bench_model(name, model, image_size,
                                      _BATCH_OVERRIDES.get(name, args.batch),
                                      dtype, xplane=args.xplane)
                row["compile_s"] = round(time.time() - t0, 1)
                # Provenance (VERDICT r3 #5): which code state and which
                # measurement method produced this row.
                row["round"] = os.environ.get("VIT_TPU_BENCH_ROUND", "r5")
                row["git"] = git_rev
                row["method"] = (
                    # objectives: params update every step, no ring needed
                    (("train-ring+xplane" if args.xplane else "train-ring")
                     if name.endswith("_obj") else
                     ("ring+xplane" if args.xplane else "ring")))
                print(json.dumps(row), flush=True)
                f.write(json.dumps(row) + "\n")
                f.flush()
            except Exception as e:  # keep the matrix going
                print(json.dumps({"model": name, "error": str(e)[:200]}),
                      flush=True)


if __name__ == "__main__":
    main()
