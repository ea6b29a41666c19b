"""SimMIM — simple masked image modeling
(parity target: reference simmim.py:67-130).

Token-replacement masking: top-k of uniform noise picks masked positions,
a learned mask token (+pos emb) replaces them, the FULL sequence encodes,
and a linear head reconstructs pixels at the masked positions.  The
reference's NumPy scatter shim and ``.numpy()`` gathers (simmim.py:9-65,
108-125 — SURVEY.md §8.5) become ``.at[].set`` and ``take_along_axis``
inside one jit.

Loss replicates the reference exactly — ``mean(|pred − target|) /
num_masked`` (simmim.py:128; note the reference divides the *mean* by
num_masked, an extra 1/num_masked factor vs the paper's sum/num_masked —
kept for output parity, it is a constant scale).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from einops import repeat
from flax import linen as nn

from vit_tpu.layers.common import Dense
from vit_tpu.models.vit import ViT


def masked_topk_indices(key, batch, num_patches, num_masked):
    """top-k of uniform noise (reference simmim.py:108); module-level so the
    parity suite can synchronize it with the TF side."""
    _, idx = jax.lax.top_k(jax.random.uniform(key, (batch, num_patches)),
                           num_masked)
    return idx


class SimMIM(nn.Module):
    """Constructor parity: reference simmim.py:68."""

    encoder: ViT
    image_size: Optional[int] = None  # informational; shapes are inferred
    masking_ratio: float = 0.5
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        assert 0 < self.masking_ratio < 1, \
            "masking ratio must be kept between 0 and 1"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        encoder = self.encoder
        patches = encoder.to_patch(img)
        batch, num_patches, pixel_values_per_patch = patches.shape

        pos_emb = encoder.pos_embedding[:, 1:(num_patches + 1)]
        tokens = encoder.patch_to_emb(patches) + pos_emb.astype(patches.dtype)

        mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                (encoder.dim,))
        mask_tokens = repeat(mask_token.astype(tokens.dtype), "d -> b n d",
                             b=batch, n=num_patches)
        mask_tokens = mask_tokens + pos_emb.astype(mask_tokens.dtype)

        num_masked = int(self.masking_ratio * num_patches)
        key = (self.make_rng("mask") if self.has_rng("mask")
               else jax.random.PRNGKey(0))
        masked_indices = masked_topk_indices(key, batch, num_patches,
                                             num_masked)

        masked_bool_mask = jnp.zeros((batch, num_patches), bool)
        batch_range = jnp.arange(batch)[:, None]
        masked_bool_mask = masked_bool_mask.at[batch_range,
                                               masked_indices].set(True)

        tokens = jnp.where(masked_bool_mask[..., None], mask_tokens, tokens)

        encoded = encoder.transformer(tokens, training=training)
        encoded_mask_tokens = jnp.take_along_axis(
            encoded, masked_indices[..., None], axis=1)

        pred_pixel_values = Dense(pixel_values_per_patch, dtype=self.dtype,
                                  name="to_pixels")(encoded_mask_tokens)
        masked_patches = jnp.take_along_axis(
            patches, masked_indices[..., None], axis=1)

        return jnp.mean(jnp.abs(
            pred_pixel_values.astype(jnp.float32)
            - masked_patches.astype(jnp.float32))) / num_masked
