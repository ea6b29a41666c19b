"""Golden parity: RegionViT vs TF reference."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models.regionvit import RegionViT
from tests.parity.conftest import assert_close


def test_regionvit_parity(tf):
    import regionvit as ref

    cfg = dict(dim=(32, 48, 64, 96), depth=(1, 1, 2, 1), window_size=4,
               num_classes=7, local_patch_size=4)
    img = np.random.RandomState(67).randn(2, 128, 128, 3).astype(np.float32)
    tfm = ref.RegionViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = RegionViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_regionvit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="RegionViT logits")
