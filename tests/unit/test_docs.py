"""docs/MODELS.md snippets stay runnable: every code block's imports and
constructor calls execute (the kwargs are the parity contract with the
reference README).  Full forward passes are exercised by the parity and
benchmark suites; here each block is executed up to its input-creation
line so the doc can't drift from the constructors."""

import os
import re

import jax
import jax.numpy as jnp

DOC = os.path.join(os.path.dirname(__file__), "..", "..", "docs",
                   "MODELS.md")


def _blocks():
    with open(DOC) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_docs_constructors_execute():
    blocks = _blocks()
    assert len(blocks) >= 25, f"expected 25+ snippets, found {len(blocks)}"
    ns = {"jax": jax, "jnp": jnp}
    for i, block in enumerate(blocks):
        lines = block.splitlines()
        # cut at the input-creation line: constructors and imports above it
        cut = next((j for j, ln in enumerate(lines)
                    if "jax.random.normal(key_x" in ln), len(lines))
        prefix = "\n".join(lines[:cut])
        try:
            exec(compile(prefix, f"<snippet {i}>", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"snippet {i} failed:\n{prefix}\n--> {e}")
