"""Reference-style bound models: ``v = bind(ViT(...), key); preds = v(img)``.

The reference's UX is stateful Keras — construct, then call
(reference vit.py:181-194).  vit-tpu's functional core (init/apply) is the
right shape for jit/pjit, but migrating users get this thin wrapper: it owns
the variables, jits the forward per (training, method) signature, and stays
a pytree leaf-compatible container (``.variables`` / ``.params`` are plain
trees usable with every other API in the framework).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn


class BoundModel:
    """A module bound to its variables with a jitted ``__call__``."""

    def __init__(self, module: nn.Module, variables: Any):
        self.module = module
        self.variables = variables
        self._jitted = {}

    @property
    def params(self):
        return self.variables.get("params", self.variables)

    def __call__(self, *args, training: bool = False,
                 rngs: Optional[dict] = None, **kwargs):
        has_bn = "batch_stats" in self.variables
        key = (training, bool(rngs), tuple(sorted(kwargs)))
        if key not in self._jitted:
            mutable = ["batch_stats"] if (training and has_bn) else False

            def fwd(variables, args, rngs, kwargs):
                return self.module.apply(
                    variables, *args, training=training,
                    rngs=rngs, mutable=mutable, **kwargs)

            self._jitted[key] = jax.jit(fwd, static_argnames=())
        out = self._jitted[key](self.variables, args, rngs or {}, kwargs)
        if training and has_bn:
            out, updates = out
            self.variables = {**self.variables, **updates}
        return out


def bind(module: nn.Module, key_or_variables, *example_args,
         **example_kwargs) -> BoundModel:
    """Bind ``module`` to freshly-initialized (or given) variables.

    ``bind(ViT(...), jax.random.PRNGKey(0), jnp.zeros((1,256,256,3)))``
    initializes; passing an existing variables dict skips init.
    """
    if isinstance(key_or_variables, jax.Array) and \
            key_or_variables.dtype == jax.numpy.uint32 or (
            hasattr(key_or_variables, "dtype")
            and jax.dtypes.issubdtype(key_or_variables.dtype, jax.dtypes.prng_key)):
        assert example_args, "bind(module, key, example_input...) needs an example input to initialize"
        variables = module.init(key_or_variables, *example_args,
                                **example_kwargs)
    else:
        variables = key_or_variables
    return BoundModel(module, variables)
