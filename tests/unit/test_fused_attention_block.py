"""Fused attention block kernel: numerics vs the exact XLA path (interpreter
mode on CPU; on-chip wins are recorded in benchmarks/)."""

import jax
import jax.numpy as jnp
from einops import rearrange

from vit_tpu.layers.common import Transformer
from vit_tpu.ops.fused_attention_block import fused_attention_block


def _ref(x, gamma, beta, wqkv, wo, bo, heads, dh, eps=1e-3):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    qkv = jnp.dot(xn, wqkv, preferred_element_type=jnp.float32).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=heads) for t in (q, k, v))
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32) * dh ** -0.5
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhij,bhjd->bhid", p, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = rearrange(o, "b h n d -> b n (h d)")
    y = jnp.dot(o, wo, preferred_element_type=jnp.float32) + bo
    return x + y.astype(x.dtype)


def _args(b=3, n=67, d=96, heads=3, dh=32):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    return (
        jax.random.normal(ks[0], (b, n, d), jnp.float32),
        jax.random.normal(ks[1], (d,)) * 0.1 + 1.0,
        jax.random.normal(ks[2], (d,)) * 0.1,
        jax.random.normal(ks[3], (d, 3 * heads * dh)) * 0.05,
        jax.random.normal(ks[4], (heads * dh, d)) * 0.05,
        jax.random.normal(ks[5], (d,)) * 0.05,
    ), heads, dh


def test_forward_matches_xla():
    args, heads, dh = _args()
    y = fused_attention_block(*args, heads, dh, None, 1e-3, True)
    yr = _ref(*args, heads, dh)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5


def test_vjp_matches_xla():
    args, heads, dh = _args()
    gf = jax.grad(lambda a: jnp.sum(jnp.sin(
        fused_attention_block(*a, heads, dh, None, 1e-3, True))))(args)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(_ref(*a, heads, dh))))(args)
    for name, a, b in zip(["dx", "dgamma", "dbeta", "dwqkv", "dwo", "dbo"],
                          gf, gr):
        rel = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)
        assert rel < 1e-5, f"{name}: rel {rel}"


def _check_transformer_tiers(kw, x, fused_attention, fused_mlp,
                             expect_tier):
    """Compare a fused-dispatch Transformer against the never/never exact
    path, forward + grads, and assert the expected tier actually fires."""
    from vit_tpu.layers.common import _fused_attention_tier

    tier = _fused_attention_tier(x, 0.0, False, x.dtype, kw["heads"],
                                 kw["dim_head"], kw["dim"], fused_attention)
    assert tier == expect_tier, f"tier {tier} != {expect_tier}"

    t_ref = Transformer(**kw, fused_attention="never", fused_mlp="never")
    params = t_ref.init(jax.random.PRNGKey(0), x)
    t_fused = Transformer(**kw, fused_attention=fused_attention,
                          fused_mlp=fused_mlp)
    params_fused = t_fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_fused)

    y_ref = t_ref.apply(params, x)
    y_fused = t_fused.apply(params, x)
    assert jnp.max(jnp.abs(y_ref - y_fused)) < 1e-5

    g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(t_ref.apply(p, x))))(params)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.sin(t_fused.apply(p, x))))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        assert jnp.max(jnp.abs(a - b)) < 1e-4


def test_transformer_interpret_hybrid_tier_matches_unfused():
    """n < 128 with a lane-packable head geometry routes the hybrid
    (nmajor) layer — full layer exactness vs the unfused path."""
    kw = dict(dim=64, depth=2, heads=4, dim_head=32, mlp_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 64))
    _check_transformer_tiers(kw, x, "interpret", "interpret", "nmajor")


def test_transformer_interpret_bmajor_tier_matches_unfused():
    """128 <= n <= 512 routes the token-major fused attention block."""
    kw = dict(dim=64, depth=2, heads=4, dim_head=32, mlp_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 130, 64))
    _check_transformer_tiers(kw, x, "interpret", "interpret", "bmajor")


def test_transformer_hybrid_honors_fused_mlp_never():
    """fused_mlp='never' must keep the exact XLA MLP even when the hybrid
    attention tier would otherwise fuse the whole layer; the attention
    falls back too (the hybrid layer fuses the MLP by construction)."""
    from vit_tpu.layers.common import apply_fused_hybrid_layer  # noqa: F401

    kw = dict(dim=64, depth=2, heads=4, dim_head=32, mlp_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 17, 64))

    t_ref = Transformer(**kw, fused_attention="never", fused_mlp="never")
    params = t_ref.init(jax.random.PRNGKey(0), x)
    t_mixed = Transformer(**kw, fused_attention="interpret",
                          fused_mlp="never")
    y_ref = t_ref.apply(params, x)
    y_mixed = t_mixed.apply(params, x)
    # With the MLP opted out the hybrid tier is skipped entirely, so this
    # must be bit-identical to the unfused path (no kernels dispatch at
    # n=17 outside the hybrid tier).
    assert jnp.array_equal(y_ref, y_mixed)


def test_batch_padding():
    # b=5 with whatever bb the heuristic picks — exercises pad/slice.
    args, heads, dh = _args(b=5, n=33)
    y = fused_attention_block(*args, heads, dh, None, 1e-3, True)
    yr = _ref(*args, heads, dh)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5


# --- biased variant (windowed models: CrossFormer DPB, RegionViT rel-pos) ---

def _ref_bias(x, gamma, beta, wqkv, wo, bo, bias, heads, dh, eps=1e-3):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    qkv = jnp.dot(xn, wqkv, preferred_element_type=jnp.float32).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=heads) for t in (q, k, v))
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32) * dh ** -0.5
    s = s + bias[None].astype(jnp.float32)  # (1|h, n, n) broadcast over batch
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhij,bhjd->bhid", p, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = rearrange(o, "b h n d -> b n (h d)")
    y = jnp.dot(o, wo, preferred_element_type=jnp.float32) + bo
    return x + y.astype(x.dtype)


def _bias_args(hb, b=3, n=49, d=96, heads=3, dh=32):
    from vit_tpu.ops.fused_attention_block import fused_attention_block_bias

    args, heads, dh = _args(b=b, n=n, d=d, heads=heads, dh=dh)
    bias = jax.random.normal(jax.random.PRNGKey(7), (hb, n, n),
                             jnp.float32) * 0.3
    return args + (bias,), heads, dh


def test_bias_forward_shared_and_per_head():
    from vit_tpu.ops.fused_attention_block import fused_attention_block_bias

    for hb in (1, 3):
        args, heads, dh = _bias_args(hb)
        y = fused_attention_block_bias(*args, heads, dh, None, 1e-3, True)
        yr = _ref_bias(*args, heads, dh)
        assert jnp.max(jnp.abs(y - yr)) < 1e-5, f"hb={hb}"


def test_bias_vjp_includes_dbias():
    from vit_tpu.ops.fused_attention_block import fused_attention_block_bias

    for hb in (1, 3):
        args, heads, dh = _bias_args(hb)
        gf = jax.grad(lambda a: jnp.sum(jnp.sin(
            fused_attention_block_bias(*a, heads, dh, None, 1e-3, True))))(args)
        gr = jax.grad(lambda a: jnp.sum(jnp.sin(_ref_bias(*a, heads, dh))))(args)
        names = ["dx", "dgamma", "dbeta", "dwqkv", "dwo", "dbo", "dbias"]
        for name, a, b in zip(names, gf, gr):
            rel = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)
            assert rel < 1e-5, f"hb={hb} {name}: rel {rel}"


def test_small_n_large_group_batch():
    """Windowed fold: thousands of 49-token groups — the n<128 bb cap."""
    args, heads, dh = _args(b=96, n=49, d=64, heads=2, dh=32)
    y = fused_attention_block(*args, heads, dh, None, 1e-5, True)
    yr = _ref(*args, heads, dh, eps=1e-5)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5


def test_window_batch_block_cap():
    """The n<128 batch-block cap is 32: Mosaic unrolls the per-head batched
    attention dots per image, so compile memory grows ~linearly with bb and
    the remote compile helper is OOM-killed on multi-kernel modules above
    this (regionvit train at the old cap of 128 — ROUND3_NOTES).  Runtime
    measured flat in bb (4.87 ms @32 vs 5.00 @128 at (4096, 56, 64))."""
    from vit_tpu.ops.fused_attention_block import _batch_per_program

    assert _batch_per_program(56, 64, 128, 2, bwd=True, b=4096) <= 32
    assert _batch_per_program(56, 512, 128, 2, bwd=True, b=64) <= 32
    # token-major tier unchanged
    assert _batch_per_program(256, 768, 768, 2, bwd=False, b=64) <= 16


def test_regionvit_fused_gate_small_groups():
    """RegionViT skips the fused path below 128 groups (the whole-module
    compile-helper OOM fix): the model still runs and matches itself with
    fused_attention='never' on CPU (where kernels are unavailable anyway,
    the gate must simply not error)."""
    import numpy as np

    from vit_tpu import RegionViT

    model = RegionViT(dim=(32, 32, 32, 32), depth=(1, 1, 1, 1),
                      window_size=2, local_patch_size=4, num_classes=7)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    out = model.apply(params, img)
    assert out.shape == (2, 7)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_b32_headline_shape_class():
    """n=65 (odd, < 128) with a lane-multiple model dim — the exact shape
    class the experimental fused_attention='bmajor' force routes through
    the block kernel for the B/32 headline retry (benchmarks/
    exp_b32_fused.py).  Forward + full VJP vs the XLA reference."""
    args, heads, dh = _args(b=8, n=65, d=128, heads=2, dh=64)
    y = fused_attention_block(*args, heads, dh, None, 1e-3, True)
    yr = _ref(*args, heads, dh)
    assert jnp.max(jnp.abs(y - yr)) < 1e-5

    gf = jax.grad(lambda a: jnp.sum(jnp.sin(
        fused_attention_block(*a, heads, dh, None, 1e-3, True))))(args)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(_ref(*a, heads, dh))))(args)
    for name, a, b in zip(["dx", "dgamma", "dbeta", "dwqkv", "dwo", "dbo"],
                          gf, gr):
        rel = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)
        assert rel < 1e-5, f"{name}: rel {rel}"
