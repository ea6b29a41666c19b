"""Debug-mode numerics guards — the TPU-native equivalent of the sanitizer
hygiene the reference never had (SURVEY.md §5: "race detection" for a
single-threaded eager zoo is nothing; here the equivalent is checkify
NaN/inf fences + deterministic-PRNG reproducibility checks in tests)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable) -> Callable:
    """Wrap a jittable fn with NaN/div-by-zero/OOB checks.

    Returns ``checked_fn(*args) -> value`` that RAISES on the first
    numerical error with a located message.  Debug tool — do not ship in
    the hot path (checkify inserts guards into the compiled program).
    """
    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree, name: str = "tree") -> None:
    """Eager finiteness assertion over a pytree (host-side; test/debug use)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.all(jnp.isfinite(leaf))):
            keys = "/".join(str(getattr(k, "key", k)) for k in path)
            raise FloatingPointError(f"non-finite values in {name}:{keys}")
