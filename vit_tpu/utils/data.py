"""Input pipeline: host→device prefetch with double buffering.

The reference has no data loader at all (SURVEY.md §1: no L7).  The TPU-
native story is simple and bandwidth-shaped: batches stream from any host
iterator, are sharded across the mesh's ``data`` axis on the host, and are
transferred ahead of compute (``prefetch`` keeps N batches in flight so the
HBM transfer overlaps the previous step).
"""

from __future__ import annotations

import collections
import threading
from typing import Any, Callable, Iterator, Optional

import jax
import numpy as np


def process_local_batch_size(global_batch_size: int) -> int:
    """Each host's share of the global batch in a multi-process run.

    The pod-scale input contract (SURVEY.md §2.5): every process loads only
    its ``global // process_count`` slice; :func:`shard_batch` assembles the
    slices into global arrays.  Single-process runs get the full batch.
    """
    count = jax.process_count()
    assert global_batch_size % count == 0, (
        f"global batch {global_batch_size} must divide evenly over "
        f"{count} processes"
    )
    return global_batch_size // count


def shard_batch(batch, mesh, axis: str = "data"):
    """Place a host batch pytree onto the mesh, sharded over ``axis``.

    Single-process: a plain sharded ``device_put``.  Multi-process (after
    :func:`vit_tpu.parallel.mesh.initialize_distributed`): each process
    passes its *local* slice of the batch and the slices are assembled into
    global arrays (``jax.make_array_from_process_local_data``) — the jitted
    train step then sees one global batch sharded over the mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch)


def prefetch(iterator: Iterator[Any], size: int = 2,
             device_put: Optional[Callable] = None) -> Iterator[Any]:
    """Keep ``size`` device-resident batches in flight ahead of the consumer.

    ``device_put`` maps a host batch to device arrays (e.g.
    ``functools.partial(shard_batch, mesh=mesh)``); defaults to
    ``jax.device_put``.
    """
    device_put = device_put or jax.device_put
    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(iterator)
            except StopIteration:
                return
            queue.append(device_put(batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)


class ThreadedLoader:
    """Background-thread host pipeline: ``make_batch(step) -> pytree``
    runs off the main thread (decode/augment), results stream through
    :func:`prefetch`."""

    def __init__(self, make_batch: Callable[[int], Any], num_steps: int,
                 queue_size: int = 4):
        self._make = make_batch
        self._num = num_steps
        self._q: collections.deque = collections.deque()
        self._sem = threading.Semaphore(0)
        self._cap = threading.Semaphore(queue_size)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        for step in range(self._num):
            self._cap.acquire()
            self._q.append(self._make(step))
            self._sem.release()

    def __iter__(self):
        for _ in range(self._num):
            self._sem.acquire()
            batch = self._q.popleft()
            self._cap.release()
            yield batch
