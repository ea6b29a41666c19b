"""Serving export: serialize a model forward as a portable StableHLO artifact.

The reference has no serving story at all (SURVEY.md §1: no L7); this is
the TPU-native one.  ``jax.export`` captures the traced + lowered forward
(StableHLO bytes with the calling convention embedded) so a production
process can serve a model **without the model code or Python tracing** —
deserialization skips straight to XLA compilation, and together with the
persistent compilation cache (``vit_tpu.enable_compile_cache``) a warm
serving restart is seconds instead of the cold trace+compile.

Two layouts:

* ``bake_params=False`` (default): the artifact is a function of
  ``(variables, image)`` — weights stay in checkpoints
  (``vit_tpu.interop.checkpoint``) and one artifact serves every
  checkpoint of the run.
* ``bake_params=True``: weights are embedded as constants — a single
  self-contained file for deployment (cast them first with
  ``cast_params(variables, jnp.bfloat16)`` for the serving dtype policy).

Note on kernels: the fused Pallas kernels gate on the *tracing* backend,
so an artifact exported on a TPU host embeds them (as TPU custom calls —
such an artifact is TPU-only), while one exported on a CPU host lowers the
pure-XLA paths and stays portable across platforms via ``platforms``.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _shape_struct(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        tree)


def export_forward(
    model,
    variables,
    image_shape: Sequence[int],
    *,
    dtype: Any = jnp.float32,
    bake_params: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``model.apply`` for ``image_shape`` inputs to StableHLO bytes.

    Args:
      model: any vit_tpu model (flax module with ``apply``).
      variables: its variable collection (params [+ batch_stats]).
      image_shape: full input shape including batch, e.g. ``(64, 224, 224, 3)``.
      dtype: input dtype (use the model's compute dtype for serving).
      bake_params: embed the weights as constants (self-contained artifact).
      platforms: lowering platforms, e.g. ``("tpu", "cpu")``; defaults to
        the current backend.

    Returns:
      ``bytes`` — write to disk; reload with :func:`load_forward`.
    """
    def fwd(v, x):
        out = model.apply(v, x)
        return out[0] if isinstance(out, tuple) else out

    img_spec = jax.ShapeDtypeStruct(tuple(image_shape), dtype)
    if bake_params:
        fn = jax.jit(functools.partial(fwd, jax.tree.map(jnp.asarray,
                                                         variables)))
        args = (img_spec,)
    else:
        fn = jax.jit(fwd)
        args = (_shape_struct(variables), img_spec)
    exported = jax_export.export(fn, platforms=platforms)(*args)
    return bytes(exported.serialize())


def load_forward(data: bytes):
    """Deserialize :func:`export_forward` bytes into a jitted callable.

    The callable has the exported signature — ``f(variables, image)`` or
    ``f(image)`` when the artifact was exported with ``bake_params=True``.
    """
    exported = jax_export.deserialize(data)
    return jax.jit(exported.call)


def save_forward(path: str, *args, **kwargs) -> None:
    """``export_forward`` straight to ``path``."""
    data = export_forward(*args, **kwargs)
    with open(path, "wb") as f:
        f.write(data)


def load_forward_file(path: str):
    """:func:`load_forward` from ``path``."""
    with open(path, "rb") as f:
        return load_forward(f.read())
