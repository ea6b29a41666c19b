"""Golden parity: Twins-SVT vs TF reference."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models.twins_svt import TwinsSVT
from tests.parity.conftest import assert_close


def test_twins_svt_parity(tf):
    import twins_svt as ref

    cfg = dict(num_classes=7,
               s1_emb_dim=32, s1_patch_size=4, s1_local_patch_size=4,
               s1_global_k=4, s1_depth=1,
               s2_emb_dim=48, s2_patch_size=2, s2_local_patch_size=4,
               s2_global_k=4, s2_depth=1,
               s3_emb_dim=64, s3_patch_size=2, s3_local_patch_size=2,
               s3_global_k=2, s3_depth=2,
               s4_emb_dim=96, s4_patch_size=2, s4_local_patch_size=2,
               s4_global_k=2, s4_depth=1)
    img = np.random.RandomState(59).randn(2, 128, 128, 3).astype(np.float32)
    tfm = ref.TwinsSVT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = TwinsSVT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_twins_svt(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="TwinsSVT logits")
