"""End-to-end classifier training: mesh + sharded train step + prefetch +
metrics + checkpointing, on synthetic data.

    python examples/train_classifier.py --model vit --steps 50 --batch 64

Runs on whatever devices are available: the single real TPU chip, or a
virtual CPU mesh (set XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build_model(name: str, image_size: int, num_classes: int, dtype):
    import vit_tpu as vt

    registry = {
        "vit": lambda: vt.ViT(image_size=image_size, patch_size=16,
                              num_classes=num_classes, dim=384, depth=6,
                              heads=6, mlp_dim=1536, dropout=0.1,
                              emb_dropout=0.1, dtype=dtype),
        "deepvit": lambda: vt.DeepViT(image_size=image_size, patch_size=16,
                                      num_classes=num_classes, dim=384,
                                      depth=6, heads=6, mlp_dim=1536,
                                      dtype=dtype),
        "cait": lambda: vt.CaiT(image_size=image_size, patch_size=16,
                                num_classes=num_classes, dim=384, depth=6,
                                cls_depth=2, heads=6, mlp_dim=1536,
                                layer_dropout=0.05, dtype=dtype),
        "nest": lambda: vt.NesT(image_size=image_size, patch_size=4,
                                num_classes=num_classes, dim=96, heads=3,
                                num_hierarchies=3, block_repeats=(2, 2, 4),
                                dtype=dtype),
    }
    return registry[name]()


def synthetic_batches(batch: int, image_size: int, num_classes: int,
                      steps: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        yield {
            "image": rng.randn(batch, image_size, image_size, 3)
            .astype(np.float32),
            "label": rng.randint(0, num_classes, size=(batch,)),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--tp", type=int, default=1,
                    help="model-axis size (tensor parallel)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches per step")
    ap.add_argument("--export", default=None,
                    help="write a serving StableHLO artifact here at the end")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args()

    from vit_tpu.parallel import mesh as mesh_lib
    from vit_tpu.parallel.train import (create_train_state, make_train_step,
                                        state_shardings)
    from vit_tpu.utils.data import prefetch, shard_batch
    from vit_tpu.utils.metrics import MetricLogger

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    n_dev = jax.device_count()
    assert n_dev % args.tp == 0
    mesh = mesh_lib.make_mesh((n_dev // args.tp, args.tp))
    print(f"devices={n_dev} mesh=dp{n_dev // args.tp}×tp{args.tp} "
          f"dtype={dtype.__name__}")

    model = build_model(args.model, args.image_size, args.num_classes, dtype)
    img0 = jnp.zeros((args.batch, args.image_size, args.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), img0)
    params = variables["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model={args.model} params={n_params / 1e6:.1f}M")

    tx = optax.adamw(args.lr)
    state = create_train_state(params, tx)

    def apply_fn(p, images, rng):
        return model.apply({"params": p}, images, training=True,
                           rngs={"dropout": rng})

    _, compile_step = make_train_step(apply_fn, tx, mesh,
                                      accum_steps=args.accum)
    step_fn = compile_step(state)
    state = jax.device_put(state, state_shardings(mesh, state))

    ckpt_mgr = None
    if args.ckpt_dir:
        from vit_tpu.interop.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(args.ckpt_dir)

    logger = MetricLogger(every=args.log_every, stream=sys.stdout)
    batches = prefetch(
        synthetic_batches(args.batch, args.image_size, args.num_classes,
                          args.steps),
        size=2,
        device_put=functools.partial(shard_batch, mesh=mesh),
    )

    rng = jax.random.PRNGKey(42)
    for i, batch in enumerate(batches):
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch["image"], batch["label"],
                                 step_rng)
        logger.log(i + 1, {"loss": metrics["loss"]})
        if ckpt_mgr is not None and (i + 1) % 50 == 0:
            # async: the write overlaps the next training steps
            ckpt_mgr.save(i + 1, state, wait=False)
    if ckpt_mgr is not None:
        ckpt_mgr.wait()
    logger.flush()
    if args.export:
        from vit_tpu.interop.export import save_forward

        save_forward(args.export, model, {"params": jax.device_get(state.params)},
                     (args.batch, args.image_size, args.image_size, 3),
                     dtype=dtype, bake_params=True)
        print(f"serving artifact: {args.export}")
    print("done")


if __name__ == "__main__":
    main()
