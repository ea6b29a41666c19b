"""Input-pipeline tests: prefetch ordering, mesh sharding, threaded loader."""

import numpy as np
import jax

from vit_tpu.parallel import mesh as mesh_lib
from vit_tpu.utils.data import ThreadedLoader, prefetch, shard_batch


def test_prefetch_preserves_order_and_content():
    batches = [{"x": np.full((4,), i)} for i in range(7)]
    out = list(prefetch(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((4,), i))


def test_shard_batch_places_on_mesh():
    mesh = mesh_lib.make_mesh((8, 1))
    batch = {"image": np.zeros((16, 8, 8, 3), np.float32),
             "label": np.arange(16)}
    placed = shard_batch(batch, mesh)
    assert placed["image"].sharding.spec[0] == "data"
    assert len(placed["label"].sharding.device_set) == 8


def test_threaded_loader():
    loader = ThreadedLoader(lambda step: {"s": np.asarray(step)}, num_steps=5,
                            queue_size=2)
    steps = [int(b["s"]) for b in loader]
    assert steps == [0, 1, 2, 3, 4]
