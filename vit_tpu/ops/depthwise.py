"""SPMD-safe grouped (depthwise-style) 2-D convolution.

XLA's SPMD partitioner mis-reduces the KERNEL gradient of grouped
convolutions when the computation is replicated over a mesh axis: with a
``model`` axis of size M and inputs not channel-sharded over it, the
depthwise dkernel comes back exactly **M× too large** (the grad transpose
lowers to a ``batch_group_count`` conv whose partial-replication
bookkeeping double-counts; reproduced on the 8-device virtual CPU mesh,
jax 0.9 — see tests/unit/test_depthwise.py).  Sharding the kernel doesn't
help; only channel-sharding the activations does, and activation layouts
belong to the compiler, not the model.

The fix is structural: keep the fast ``lax.conv_general_dilated`` forward
but give it a custom VJP whose backward differentiates an equivalent
"taps" formulation — an unrolled sum of strided slices times per-tap
kernel rows.  Every backward op is then a slice / pad / multiply /
reduce, all of which SPMD partitions correctly on any mesh.  Kernels here
are tiny (3×3 everywhere in the zoo), so the unroll is 9 fused
multiply-adds — depthwise convs run on the VPU either way.

Covers ``feature_group_count == in_channels`` (one input channel per
group; output may have a per-group multiplier — PiT's pool maps 1→2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _conv(x, kernel, strides, padding):
    return lax.conv_general_dilated(
        x, kernel, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _taps(x, kernel, strides, padding):
    """Equivalent grouped conv as an unrolled sum over kernel taps."""
    kh, kw, cpg, cout = kernel.shape
    assert cpg == 1, "grouped path requires one input channel per group"
    cin = x.shape[-1]
    mult = cout // cin
    sh, sw = strides
    pads = lax.padtype_to_pads(x.shape[1:3], (kh, kw), strides, padding) \
        if isinstance(padding, str) else list(padding)
    (ph0, ph1), (pw0, pw1) = pads
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    h_out = (x.shape[1] + ph0 + ph1 - kh) // sh + 1
    w_out = (x.shape[2] + pw0 + pw1 - kw) // sw + 1
    if mult > 1:
        # Output channel o belongs to group o // mult and reads input
        # channel o // mult (lax/Keras grouped-conv channel mapping).
        xp = jnp.repeat(xp, mult, axis=-1)
    out = jnp.zeros((x.shape[0], h_out, w_out, cout), x.dtype)
    for i in range(kh):
        for j in range(kw):
            window = xp[:, i: i + (h_out - 1) * sh + 1: sh,
                        j: j + (w_out - 1) * sw + 1: sw, :]
            out = out + window * kernel[i, j, 0, :]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_conv2d(x, kernel, strides, padding):
    """Grouped NHWC conv (``feature_group_count = in_channels``) whose
    backward is SPMD-safe on any mesh.  ``strides`` is an (sh, sw) tuple;
    ``padding`` a lax padding spec ("SAME"/"VALID" or explicit pairs)."""
    return _conv(x, kernel, strides, padding)


def _fwd(x, kernel, strides, padding):
    return _conv(x, kernel, strides, padding), (x, kernel)


def _bwd(strides, padding, res, g):
    x, kernel = res
    # Only the KERNEL gradient hits the XLA partial-replication bug (its
    # transpose is the batch_group_count conv); the input gradient is a
    # plain feature_group conv and partitions correctly — keep it on the
    # fast native path and pay the taps formulation only for the tiny
    # (kh, kw, 1, cout) kernel grad.
    _, vjp_x = jax.vjp(lambda x_: _conv(x_, kernel, strides, padding), x)
    _, vjp_k = jax.vjp(lambda k_: _taps(x, k_, strides, padding), kernel)
    return vjp_x(g)[0], vjp_k(g)[0]


grouped_conv2d.defvjp(_fwd, _bwd)
