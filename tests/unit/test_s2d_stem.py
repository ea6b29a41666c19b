"""The space-to-depth stem rewrite computes the identical convolution.

`CrossEmbedLayer`'s fused stem (one big-K strided conv with the child
kernels offset-embedded) is rewritten when `K % stride == 0` into a
stride-1 conv over a space-to-depth-packed input (VIT_TPU_S2D_STEM,
default on): pad once with the conv's own (pad_lo, pad_hi), pack each
stride x stride pixel block into channels (ry, rx, c), and reindex the
kernel (K, K, cin, cout) -> (K/s, K/s, s*s*cin, cout) the same way.
Same taps, same contraction — only the layout XLA's conv emitter sees
changes (profiles/crossformer.md names the strided stem at 31 TF/s).

These tests pin the rewrite elementwise against both the strided fused
conv and the unfused concat-of-convs ground truth.
"""

import jax
import jax.numpy as jnp
import pytest

from vit_tpu.layers.common import Conv
from vit_tpu.models.crossformer import CrossEmbedLayer


CASES = [
    # canonical stage-1 family: K=32, s=4 (the profiled 2.5 ms op)
    ((4, 8, 16, 32), 4, 64, 32),
    # stage-2+ family: K=4, s=2
    ((2, 4), 2, 16, 32),
    # K not a multiple of s — rewrite must decline, fused path still exact
    ((3, 8), 4, 16, 32),
]


def _unfused_reference(params, x, kernel_sizes, stride, dim):
    """Concat of the individual child convs — the reference semantics
    (crossformer.py:30-48)."""
    kernel_sizes = sorted(kernel_sizes)
    num_scales = len(kernel_sizes)
    dim_scales = [int(dim / (2 ** i)) for i in range(1, num_scales)]
    dim_scales = [*dim_scales, dim - sum(dim_scales)]
    outs = []
    for i, (k, d) in enumerate(zip(kernel_sizes, dim_scales)):
        conv = Conv(d, (k, k), strides=stride, padding="SAME")
        outs.append(conv.apply({"params": params["params"][f"conv_{i}"]}, x))
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("kernel_sizes,stride,hw,dim", CASES)
def test_s2d_stem_matches_strided_and_unfused(kernel_sizes, stride, hw, dim,
                                              monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, 3))
    m = CrossEmbedLayer(dim=dim, kernel_sizes=kernel_sizes, stride=stride)
    params = m.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("VIT_TPU_S2D_STEM", "1")
    out_s2d = m.apply(params, x)
    monkeypatch.setenv("VIT_TPU_S2D_STEM", "0")
    out_strided = m.apply(params, x)
    out_ref = _unfused_reference(params, x, kernel_sizes, stride, dim)

    assert out_s2d.shape == out_strided.shape == out_ref.shape
    # identical taps, f32 accumulation — only summation order may differ
    assert float(jnp.max(jnp.abs(out_s2d - out_strided))) < 1e-4
    assert float(jnp.max(jnp.abs(out_s2d - out_ref))) < 1e-4


def test_s2d_stem_gradients_flow(monkeypatch):
    monkeypatch.setenv("VIT_TPU_S2D_STEM", "1")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    m = CrossEmbedLayer(dim=32, kernel_sizes=(4, 8, 16, 32), stride=4)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    grads = jax.grad(loss)(params)
    for i in range(4):
        g = grads["params"][f"conv_{i}"]["kernel"]
        assert float(jnp.max(jnp.abs(g))) > 0.0, f"conv_{i} got no gradient"
