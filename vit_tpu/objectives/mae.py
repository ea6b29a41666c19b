"""MAE — masked autoencoder objective (parity target: reference mae.py:17-92).

Wraps a built :class:`vit_tpu.models.vit.ViT` encoder through its explicit
encoder protocol (the reference spelunks ``encoder.patch_embedding.layers``
— mae.py:36-38).  Masking, gathers, and the decoder all run on-device inside
one jit (the reference's ``.numpy()`` gathers at mae.py:63,66 force host
syncs and silently kill gradients — SURVEY.md §8.5).

Divergence (SURVEY.md §8.2): the reference's ``tf.square(pred, target)``
passes the target as the op *name*, so its "loss" is mean(pred²); here the
loss is the paper-correct ``mean((pred − target)²)`` over masked patches.

Masking randomness comes from the ``'mask'`` PRNG collection
(``rngs={'mask': key}``); without it a fixed key keeps evaluation
deterministic.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from einops import repeat
from flax import linen as nn

from vit_tpu.layers.common import Dense, Transformer
from vit_tpu.models.vit import ViT


def random_masking_indices(key, batch, num_patches):
    """argsort of uniform noise (reference mae.py:58); module-level so the
    parity suite can synchronize it with the TF side."""
    return jnp.argsort(jax.random.uniform(key, (batch, num_patches)), axis=-1)


class MAE(nn.Module):
    """Constructor parity: reference mae.py:18-26."""

    encoder: ViT
    decoder_dim: int
    image_size: Optional[int] = None  # informational; shapes are inferred
    masking_ratio: float = 0.75
    decoder_depth: int = 1
    decoder_heads: int = 8
    decoder_dim_head: int = 64
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        assert 0 < self.masking_ratio < 1, \
            "masking ratio must be kept between 0 and 1"

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        encoder = self.encoder
        encoder_dim = encoder.dim

        patches = encoder.to_patch(img)
        batch, num_patches, pixel_values_per_patch = patches.shape

        tokens = encoder.patch_to_emb(patches)
        tokens = tokens + encoder.pos_embedding[:, 1:(num_patches + 1)].astype(
            tokens.dtype)

        num_masked = int(self.masking_ratio * num_patches)
        key = (self.make_rng("mask") if self.has_rng("mask")
               else jax.random.PRNGKey(0))
        rand_indices = random_masking_indices(key, batch, num_patches)
        masked_indices = rand_indices[:, :num_masked]
        unmasked_indices = rand_indices[:, num_masked:]

        # on-device gathers (reference mae.py:62-66 does this on host)
        tokens = jnp.take_along_axis(tokens, unmasked_indices[..., None],
                                     axis=1)
        masked_patches = jnp.take_along_axis(patches,
                                             masked_indices[..., None], axis=1)

        encoded_tokens = encoder.transformer(tokens, training=training)

        if encoder_dim != self.decoder_dim:
            decoder_tokens = Dense(self.decoder_dim, dtype=self.dtype,
                                   name="enc_to_dec")(encoded_tokens)
        else:
            decoder_tokens = encoded_tokens

        # The reference sizes this from encoder.pos_embedding.shape[-2],
        # which INCLUDES the CLS slot (mae.py:36,44) — one extra (unused)
        # row; mirrored here so transplanted checkpoints line up.
        decoder_pos_emb = nn.Embed(num_patches + 1, self.decoder_dim,
                                   name="decoder_pos_emb")
        decoder_tokens = decoder_tokens + decoder_pos_emb(unmasked_indices)

        mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                (self.decoder_dim,))
        mask_tokens = repeat(mask_token.astype(decoder_tokens.dtype),
                             "d -> b n d", b=batch, n=num_masked)
        mask_tokens = mask_tokens + decoder_pos_emb(masked_indices)

        # mask tokens FIRST, then visible (reference mae.py:82)
        decoder_input = jnp.concatenate([mask_tokens, decoder_tokens], axis=1)
        decoded_tokens = Transformer(
            dim=self.decoder_dim, depth=self.decoder_depth,
            heads=self.decoder_heads, dim_head=self.decoder_dim_head,
            mlp_dim=self.decoder_dim * 4, dtype=self.dtype, name="decoder",
        )(decoder_input, training=training)

        mask_tokens = decoded_tokens[:, :num_masked]
        pred_pixel_values = Dense(pixel_values_per_patch, dtype=self.dtype,
                                  name="to_pixels")(mask_tokens)

        # paper-correct MSE (§8.2)
        return jnp.mean(jnp.square(
            pred_pixel_values.astype(jnp.float32)
            - masked_patches.astype(jnp.float32)))
