"""Worker for the real 2-process multi-host test (see test_multihost.py).

Each process owns 4 virtual CPU devices (8 global), initializes the
distributed runtime against a localhost coordinator, loads only its
process-local batch slice, assembles the global batch via shard_batch,
and runs two SPMD SGD steps on a tiny linear model.  Prints per-step
losses for the parent to compare across processes and against the
single-process pin.

Usage: python _mp_worker.py <process_id> <port>
"""

import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from vit_tpu.parallel import mesh as mesh_lib  # noqa: E402
from vit_tpu.utils.data import (process_local_batch_size,  # noqa: E402
                                shard_batch)

idx, count = mesh_lib.initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
assert (idx, count) == (pid, 2), (idx, count)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

mesh = mesh_lib.make_mesh((8, 1))
GLOBAL_BATCH = 16
local_bs = process_local_batch_size(GLOBAL_BATCH)
assert local_bs == 8

# deterministic global data; each process materializes only its slice
rng = np.random.RandomState(0)
full_x = rng.randn(GLOBAL_BATCH, 4).astype(np.float32)
full_y = rng.randn(GLOBAL_BATCH, 1).astype(np.float32)
lo = pid * local_bs
batch = shard_batch({"x": full_x[lo:lo + local_bs],
                     "y": full_y[lo:lo + local_bs]}, mesh)
assert batch["x"].shape == (GLOBAL_BATCH, 4)  # global shape, local shards

w = jax.device_put(np.ones((4, 1), np.float32) * 0.1,
                   NamedSharding(mesh, P()))  # replicated params


@jax.jit
def step(w, x, y):
    def loss_fn(w):
        return jnp.mean((x @ w - y) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(w)
    return w - 0.1 * g, loss


for i in range(2):
    w, loss = step(w, batch["x"], batch["y"])
    print(f"LOSS {i} {float(loss):.8f}", flush=True)
print("OK", flush=True)
