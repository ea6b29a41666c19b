"""Golden parity: ScalableViT vs a §8.3-patched TF reference (the upstream
block-order bug executes SSA-FF-FF-IWSA; both sides here run the paper
order SSA-FF-PEG-IWSA-FF)."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models.scalable_vit import ScalableViT
from tests.parity.conftest import assert_close


def test_scalable_vit_parity(tf):
    import scalable_vit as ref

    # Patch §8.3: unpack in construction order so IWSA and the second FF run
    # in the paper sequence.
    def fixed_call(self, x, training=True):
        for ssa, ff1, peg, ff2, iwsa in self.layers:
            x = ssa(x, training=training) + x
            x = ff1(x, training=training) + x
            if peg is not None:
                x = peg(x)
            x = iwsa(x, training=training) + x
            x = ff2(x, training=training) + x
        return self.norm(x)

    ref.Transformer.call = fixed_call

    cfg = dict(num_classes=9, dim=32, heads=(2, 4), depth=(1, 2),
               reduction_factor=(4, 2), window_size=(8, None),
               ssa_dim_key=(16, 16), ssa_dim_value=(16, 16),
               iwsa_dim_key=(16, 16), iwsa_dim_value=(16, 16))
    img = np.random.RandomState(71).randn(2, 128, 128, 3).astype(np.float32)
    tfm = ref.ScalableViT(**cfg)
    tf_out = tfm(tf.constant(img), training=False).numpy()

    ours = ScalableViT(**cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_scalable_vit(tfm, variables)
    jax_out = ours.apply(variables, jnp.asarray(img))
    assert_close(jax_out, tf_out, label="ScalableViT logits (patched ref)")
