"""Golden parity: ATS-ViT vs TF reference with SYNCHRONIZED gumbel noise.

The sampling step is stochastic on both sides; parity is checked by
injecting the same noise tensor into both implementations.  The reference
pads sampled ids to the batch-max unique count (data-dependent width);
ours keeps all k slots (static shapes, SURVEY.md §3.5) — identical valid
token sets, so CLS logits must agree to 1e-4.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.interop import tf_weights
from vit_tpu.models import ats_vit
from tests.parity.conftest import assert_close

CFG = dict(image_size=64, patch_size=8, num_classes=13, dim=64, depth=3,
           max_tokens_per_depth=(32, 16, 8), heads=2, mlp_dim=128,
           dim_head=32)


def _sync_noise(tf, ref, seed=0, max_n=256):
    """Make both sides draw identical 'gumbel' noise.

    After the first sampling layer the reference's token axis is
    data-dependent (batch-max unique count) while ours is the static k —
    but both lay out valid tokens right-aligned (zeros padded in front), so
    slicing a master noise table from the RIGHT gives identical noise on
    every valid column."""
    rng = np.random.RandomState(seed)
    cache = {}

    def noise_for(shape):
        b, k, n = (int(s) for s in shape)
        if (b, k) not in cache:
            u = rng.uniform(1e-3, 1 - 1e-3, size=(b, k, max_n)).astype(np.float32)
            cache[(b, k)] = -np.log(-np.log(u + 1e-6) + 1e-6)
        return cache[(b, k)][..., -n:]

    ref.sample_gumbel = lambda shape, dtype, eps=1e-6: tf.constant(
        noise_for(shape))
    ats_vit.sample_gumbel = lambda key, shape, eps=1e-6: jnp.asarray(
        noise_for(shape))


def test_ats_parity_synchronized_noise(tf):
    import ats_vit as ref

    _sync_noise(tf, ref, seed=7)
    img = np.random.RandomState(83).randn(2, 64, 64, 3).astype(np.float32)

    tfm = ref.ViT(**CFG)
    tf_logits, tf_ids = tfm(tf.constant(img), return_sampled_token_ids=True,
                            training=False)
    tf_logits = tf_logits.numpy()
    tf_ids = tf_ids.numpy()

    ours = ats_vit.ViT(**CFG)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = tf_weights.transplant_ats_vit(tfm, variables)
    jax_logits, jax_ids = ours.apply(variables, jnp.asarray(img),
                                     return_sampled_token_ids=True)

    assert_close(jax_logits, tf_logits, label="ATS-ViT logits")

    # Same valid token sets (ours is fixed-width, theirs batch-max width).
    jax_ids = np.asarray(jax_ids)
    for b in range(img.shape[0]):
        ref_set = set(tf_ids[b][tf_ids[b] >= 0].tolist())
        our_set = set(jax_ids[b][jax_ids[b] >= 0].tolist())
        assert ref_set == our_set, (b, ref_set, our_set)
