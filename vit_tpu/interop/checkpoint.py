"""Checkpoint / resume — orbax-backed param+optimizer pytree persistence.

The reference has no checkpointing story at all (SURVEY.md §5: models are
Keras ``Model``s but no code or doc ever saves them).  Here train state
(params, opt_state, step) round-trips through orbax; combined with the
TF→JAX transplant utilities (``vit_tpu.interop.tf_weights``) this also
covers importing reference-trained weights.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (e.g. a TrainState) to ``path``."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state))


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree from ``path``.

    Pass ``target`` (a pytree of like-shaped arrays, e.g. a freshly-inited
    TrainState) to restore with matching structure/dtypes and device
    placement; without it, raw arrays are returned.
    """
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    if target is not None:
        import orbax.checkpoint as ocp

        restored = ckpt.restore(path, item=jax.device_get(target))
        # Re-place on the target's shardings if it has committed devices.
        return jax.tree.map(
            lambda r, t: jax.device_put(r, t.sharding)
            if hasattr(t, "sharding") else r,
            restored, target)
    return ckpt.restore(path)


class CheckpointManager:
    """Rolling step-indexed checkpoints with resume-from-latest — the
    minimal failure-recovery story (SURVEY.md §5: restart-from-checkpoint
    under JAX multi-process; no elastic membership, by design)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = True) -> None:
        """Persist ``state`` at ``step``.

        ``wait=False`` returns as soon as the host copy is snapshotted and
        lets orbax write in the background — the train loop overlaps
        checkpoint I/O with compute; call :meth:`wait` (or the next
        ``save``/``restore``) to block on durability when it matters
        (end of run, pre-emption handler)."""
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        if wait:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        """Block until all in-flight async saves are durable."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, f"no checkpoints in {self.directory}"
        if target is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(jax.device_get(target)))
        return self._mgr.restore(step)
