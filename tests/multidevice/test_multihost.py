"""Multi-process entry point — the single-process-testable surface.

Real pod behavior (N processes × M local devices) cannot run on one host;
these tests pin the process-count=1 paths, the per-process batch math, and
that the global-assembly branch of shard_batch produces arrays identical
to the single-process path (process_count=1 makes local == global).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.parallel import mesh as mesh_lib
from vit_tpu.utils.data import process_local_batch_size, shard_batch


def test_initialize_distributed_single_process_noop():
    idx, count = mesh_lib.initialize_distributed(num_processes=1)
    assert (idx, count) == (0, 1)
    # bare auto-detect outside a pod falls back to single-process
    idx, count = mesh_lib.initialize_distributed()
    assert (idx, count) == (0, 1)


def test_process_local_batch_size():
    assert process_local_batch_size(128) == 128  # process_count == 1
    try:
        process_local_batch_size(7)
    except AssertionError:
        pass  # only divisibility is enforced; count=1 divides everything
    # (the divisibility assert fires for count > 1, untestable single-host)


def test_shard_batch_global_assembly_matches_device_put():
    mesh = mesh_lib.make_mesh((8, 1))
    batch = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
             "y": np.arange(8, dtype=np.int32)}
    placed = shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(placed["x"]), batch["x"])
    np.testing.assert_array_equal(np.asarray(placed["y"]), batch["y"])
    # sharded over the data axis: 8 single-row shards
    assert len(placed["x"].sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in placed["x"].addressable_shards}
    assert shard_shapes == {(1, 4)}


def test_two_process_train_matches_single_process():
    """REAL multi-process run: 2 spawned processes × 4 virtual CPU devices,
    localhost coordinator.  Exercises jax.distributed handshake, the
    process_count=2 branch of shard_batch (global-array assembly from
    process-local slices), and a 2-step SPMD train whose losses must match
    a single-process run of the same math bit-for-bit."""
    import os
    import socket
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_mp_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(i), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and "OK" in out, \
            f"process {i} failed:\n{out}"

    def losses(out):
        return [float(ln.split()[2]) for ln in out.splitlines()
                if ln.startswith("LOSS")]

    l0, l1 = losses(outs[0]), losses(outs[1])
    assert len(l0) == 2 and l0 == l1, (l0, l1)

    # single-process pin: same data, same math, this process's 8 devices
    rng = np.random.RandomState(0)
    full_x = rng.randn(16, 4).astype(np.float32)
    full_y = rng.randn(16, 1).astype(np.float32)
    w = jnp.ones((4, 1), jnp.float32) * 0.1

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    expect = []
    for _ in range(2):
        w, loss = step(w, full_x, full_y)
        expect.append(float(loss))
    np.testing.assert_allclose(l0, expect, rtol=1e-6)


def test_make_array_from_process_local_data_path():
    """Exercise the multi-process branch directly (count=1 → local==global)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_lib.make_mesh((8, 1))
    sharding = NamedSharding(mesh, P("data"))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = jax.make_array_from_process_local_data(sharding, x)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding == sharding
