"""One-off on-chip check for the widened d-pad-skip rule (ADVICE r4 #1).

The flash dispatch skips the 64-lane zero-pad for every head dim that is a
multiple of 32, but only d=32 was measured on real Mosaic
(exp_scalable_iwsa.py).  This runs the forced-flash path at d=96 on the
chip and compares against the XLA path at matching precision — pass/fail
on max abs error (bf16 attention tolerance ~2e-2).

Usage: python benchmarks/check_d96.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from vit_tpu.ops.attention import _xla_attention, \
        scaled_dot_product_attention

    b, h, n, d = 2, 2, 1024, 96
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.bfloat16) for kk in ks)
    scale = d ** -0.5

    flash = jax.jit(lambda q, k, v: scaled_dot_product_attention(
        q, k, v, scale=scale, use_flash="force"))
    xla = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale=scale))

    out_f = jax.block_until_ready(flash(q, k, v)).astype(jnp.float32)
    out_x = jax.block_until_ready(xla(q, k, v)).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out_f - out_x)))
    ok = err < 2e-2
    print(f"d=96 forced-flash vs XLA on {jax.devices()[0].device_kind}: "
          f"max_abs_err={err:.5f} -> {'PASS' if ok else 'FAIL'}")

    # backward too: the streaming bwd kernel rides the same skip
    def loss_f(q, k, v):
        return jnp.sum(scaled_dot_product_attention(
            q, k, v, scale=scale, use_flash="force").astype(jnp.float32) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=scale)
                       .astype(jnp.float32) ** 2)

    g_f = jax.block_until_ready(jax.jit(jax.grad(loss_f, (0, 1, 2)))(q, k, v))
    g_x = jax.block_until_ready(jax.jit(jax.grad(loss_x, (0, 1, 2)))(q, k, v))
    gerr = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b_.astype(jnp.float32))))
               for a, b_ in zip(g_f, g_x))
    # grads of a sum-of-squares over n=1024 rows accumulate bf16 rounding;
    # scale tolerance to the grad magnitude
    gscale = max(float(jnp.max(jnp.abs(a))) for a in g_x)
    gok = gerr < 0.02 * max(gscale, 1.0)
    print(f"d=96 backward: max_abs_err={gerr:.4f} (grad scale {gscale:.2f}) "
          f"-> {'PASS' if gok else 'FAIL'}")
    sys.exit(0 if (ok and gok) else 1)


if __name__ == "__main__":
    main()
