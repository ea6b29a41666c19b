"""Golden parity: CrossFormer vs TF reference (eval path; the reference's
.numpy() DPB gather works in eager mode, so eval logits are comparable)."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models.crossformer import CrossFormer
from tests.parity.conftest import assert_close


def test_crossformer_parity(tf):
    import crossformer as ref

    cfg = dict(num_classes=5, dim=(32, 64, 96, 128), depth=(1, 1, 1, 1),
               global_window_size=(4, 2, 2, 1), local_window_size=4,
               cross_embed_kernel_sizes=((2, 4), (2, 4), (2, 4), (2, 4)),
               cross_embed_strides=(4, 2, 2, 2))
    img = np.random.RandomState(61).randn(2, 128, 128, 3).astype(np.float32)
    tfm = ref.CrossFormer(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = CrossFormer(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_crossformer(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="CrossFormer logits")
