"""Shape/jit tests: Twins-SVT."""

import jax
import jax.numpy as jnp

from vit_tpu.models.twins_svt import TwinsSVT


def test_twins_svt_shape():
    m = TwinsSVT(num_classes=9,
                 s1_emb_dim=32, s1_patch_size=4, s1_local_patch_size=4,
                 s1_global_k=4, s1_depth=1,
                 s2_emb_dim=48, s2_patch_size=2, s2_local_patch_size=4,
                 s2_global_k=4, s2_depth=1,
                 s3_emb_dim=64, s3_patch_size=2, s3_local_patch_size=2,
                 s3_global_k=2, s3_depth=1,
                 s4_emb_dim=96, s4_patch_size=2, s4_local_patch_size=2,
                 s4_global_k=2, s4_depth=1)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(params, img)
    assert out.shape == (2, 9)
    assert jnp.all(jnp.isfinite(out))
