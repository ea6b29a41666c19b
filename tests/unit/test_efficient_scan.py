"""The injectable-encoder hook composes with the scan-compiled encoder —
the 'efficient ViT' dependency-inversion point (reference efficient.py:14,30)
accepting a genuinely different TPU-native encoder implementation."""

import jax
import jax.numpy as jnp

from vit_tpu.layers.scan import ScannedTransformer
from vit_tpu.models import efficient


def test_efficient_vit_with_scanned_transformer():
    encoder = ScannedTransformer(dim=64, depth=4, heads=2, dim_head=32,
                                 mlp_dim=128, remat=True)
    m = efficient.ViT(image_size=64, patch_size=16, num_classes=6,
                      dim=64, transformer=encoder)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(params, img)
    assert out.shape == (2, 6)
    assert jnp.all(jnp.isfinite(out))
    # stacked layer params confirm the scan layout is in use
    stacked = params["params"]["transformer"]["layers"]["attn"]["to_qkv"]["kernel"]
    assert stacked.shape[0] == 4
