"""Structured per-step metrics + host logging.

The reference's only observability is two stray demo ``print``s
(SURVEY.md §5).  Here: train steps return a metrics dict; ``MetricLogger``
drains them on the host (async-friendly — device_get only on flush),
optionally mirroring to a TensorBoard writer when available.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


class MetricLogger:
    def __init__(self, every: int = 10, writer_dir: Optional[str] = None,
                 stream=None):
        self.every = every
        self.stream = stream or sys.stderr
        self._pending: list[tuple[int, Dict[str, Any]]] = []
        self._t0 = time.time()
        self._writer = None
        if writer_dir is not None:
            try:
                from flax.metrics import tensorboard

                self._writer = tensorboard.SummaryWriter(writer_dir)
            except Exception:
                self._writer = None

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        """Queue a metrics dict (device arrays fine — fetched on flush)."""
        self._pending.append((step, metrics))
        if step % self.every == 0:
            self.flush()

    def flush(self) -> None:
        for step, metrics in self._pending:
            host = {k: float(np.asarray(jax.device_get(v)).ravel()[0])
                    if hasattr(v, "shape") or hasattr(v, "dtype") else v
                    for k, v in metrics.items()}
            host["step"] = int(step)
            host["wall_s"] = round(time.time() - self._t0, 3)
            print(json.dumps(host), file=self.stream, flush=True)
            if self._writer is not None:
                for k, v in host.items():
                    if isinstance(v, (int, float)) and k != "step":
                        self._writer.scalar(k, v, step)
        self._pending.clear()
