"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5).  Here: ``jax.profiler`` traces
(perfetto/XPlane dumps viewable in TensorBoard or ui.perfetto.dev),
per-layer ``jax.named_scope`` annotation, and a simple steady-state timer
that forces device completion (``block_until_ready`` + host transfer) so
numbers are honest on the async axon dispatch path.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace around a block of device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope


def op_breakdown(logdir: str, top: int = 25) -> list[dict]:
    """Aggregate device-op self-times from an XPlane trace under ``logdir``.

    Returns op rows sorted by total device time: ``{name, occurrences,
    total_ms, pct}``.  Works without TensorBoard — parses the raw
    ``*.xplane.pb`` with the TSL proto schema, so the single-core build box
    can answer "where does the step time go" directly.
    """
    import glob
    import os
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    total_ps = 0
    per_op: dict = defaultdict(lambda: [0, 0])  # name -> [count, ps]
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            # 'XLA Ops' carries per-op executions; skip step/module framing
            # lines which would double-count.
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_op[name][0] += 1
                per_op[name][1] += ev.duration_ps
                total_ps += ev.duration_ps

    rows = [
        {
            "name": name,
            "occurrences": cnt,
            "total_ms": ps / 1e9,
            "pct": 100.0 * ps / max(total_ps, 1),
        }
        for name, (cnt, ps) in per_op.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows[:top]


def benchmark(fn: Callable, *args, iters: int = 30, warmup: int = 5,
              **kwargs) -> dict:
    """Time a jitted callable: median/mean seconds per call.

    Forces completion through a host transfer of one output leaf each
    phase boundary (plain ``block_until_ready`` has been observed to
    return early on the experimental axon platform during warm-up).
    """
    def force(out):
        leaf = jax.tree.leaves(out)[0]
        jax.block_until_ready(leaf)
        np.asarray(jax.device_get(leaf)).ravel()[:1]
        return out

    for _ in range(warmup):
        out = fn(*args, **kwargs)
    force(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        force(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "mean_s": float(times.mean()),
        "median_s": float(np.median(times)),
        "min_s": float(times.min()),
        "iters": iters,
    }


def benchmark_throughput(fn: Callable, *args, batch: int, iters: int = 30,
                         warmup: int = 5, **kwargs) -> dict:
    """Amortized throughput: enqueue ``iters`` dependent steps, force once.

    Right for training loops where steps chain (state feeds forward) — the
    per-step dispatch overlaps device compute.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(jax.device_get(leaf)).ravel()[0])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(jax.device_get(leaf)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_step": dt, "items_per_sec": batch / dt, "iters": iters}
