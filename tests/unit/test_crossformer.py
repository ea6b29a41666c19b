"""Shape/jit/grad tests: CrossFormer."""

import jax
import jax.numpy as jnp

from vit_tpu.models.crossformer import CrossFormer


def _small():
    return CrossFormer(num_classes=6, dim=(32, 64, 96, 128), depth=(1, 1, 1, 1),
                       global_window_size=(4, 2, 2, 1), local_window_size=4,
                       cross_embed_kernel_sizes=((2, 4), (2, 4), (2, 4), (2, 4)),
                       cross_embed_strides=(4, 2, 2, 2))


def test_crossformer_shape():
    m = _small()
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(params, img)
    assert out.shape == (2, 6)
    assert jnp.all(jnp.isfinite(out))


def test_crossformer_dpb_gets_gradients():
    # The reference's .numpy() gather kills DPB gradients (SURVEY.md §8.5);
    # ours must flow.
    m = _small()
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), img)

    def loss(p):
        return jnp.sum(m.apply(p, img) ** 2)

    grads = jax.grad(loss)(params)
    g = grads["params"]["short_attn_0_0"]["dpb"]["fc0"]["kernel"]
    assert float(jnp.max(jnp.abs(g))) > 0.0
