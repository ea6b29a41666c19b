"""MPP — BERT-style masked patch prediction
(parity target: reference mpp.py:133-218; loss mpp.py:90-131).

A ``mask_prob`` subset of patches is corrupted — random-patch replacement
with prob ``random_patch_prob``, mask-token replacement with prob
``replace_prob`` — and the encoder predicts each masked patch's
mean-color bucket (``2^(bits·channels)`` classes).  All masking runs
on-device (the reference mutates ``.numpy()`` views of eager tensors with
undefined aliasing — mpp.py:188-197, SURVEY.md §8.5).

Divergences, all paper-correct (SURVEY.md §8):
* §8.7 — the reference calls ``softmax_cross_entropy_with_logits`` with the
  *prediction* as labels and the integer (non-one-hot) bucket id as logits;
  here: CE(one_hot(bucket_label), predicted_logits) over masked positions.
* §8.15 (found in round 1) — the reference clips the target with
  ``clip_value_min=tf.reduce_min(mpv)`` == mpv, i.e. clamps every pixel to
  ``max_pixel_val``, making the target constant; here the target clamps
  from above only (the upstream torch semantics).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from einops import rearrange, reduce, repeat
from flax import linen as nn

from vit_tpu.layers.common import Dense
from vit_tpu.models.vit import ViT


def prob_mask_like(shape, prob, key):
    return jax.random.uniform(key, shape) < prob


def get_mask_subset_with_prob(batch, seq_len, prob, key):
    """Top-k of uniform noise (reference mpp.py:78-88), on-device scatter."""
    max_masked = math.ceil(prob * seq_len)
    rand = jax.random.uniform(key, (batch, seq_len))
    _, sampled_indices = jax.lax.top_k(rand, max_masked)
    mask = jnp.zeros((batch, seq_len), bool)
    return mask.at[jnp.arange(batch)[:, None], sampled_indices].set(True)


class MPPLoss(nn.Module):
    """Reference mpp.py:90-131, with the §8.7/§8.15 fixes."""

    patch_size: int
    channels: int
    output_channel_bits: int
    max_pixel_val: float
    mean: Optional[Sequence[float]] = None
    std: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, predicted_patches, target, mask, training=False):
        p, c = self.patch_size, self.channels
        mpv, bits = self.max_pixel_val, self.output_channel_bits
        bin_size = mpv / (2 ** bits)

        target = target.astype(jnp.float32)
        if self.mean is not None and self.std is not None:
            mean = jnp.asarray(self.mean, jnp.float32).reshape(-1, 1, 1)
            std = jnp.asarray(self.std, jnp.float32).reshape(-1, 1, 1)
            target = target * std + mean

        target = jnp.minimum(target, mpv)  # clamp from above (§8.15)
        avg_target = reduce(target, "b (h p1) (w p2) c -> b (h w) c", "mean",
                            p1=p, p2=p)

        channel_bins = jnp.arange(bin_size, mpv, bin_size)
        discretized_target = jnp.sum(
            avg_target[..., None] >= channel_bins, axis=-1)

        bin_mask = (2 ** bits) ** jnp.arange(0, c)
        target_label = jnp.sum(bin_mask * discretized_target, axis=-1)

        logits = predicted_patches.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_token = -jnp.take_along_axis(
            logp, target_label[..., None], axis=-1)[..., 0]
        mask_f = mask.astype(jnp.float32)
        return jnp.sum(per_token * mask_f) / jnp.maximum(jnp.sum(mask_f), 1.0)


class MPP(nn.Module):
    """Constructor parity: reference mpp.py:134-146."""

    transformer: ViT
    patch_size: int
    image_size: Optional[int] = None  # informational; shapes are inferred
    dim: Optional[int] = None         # informational; inferred from encoder
    output_channel_bits: int = 3
    channels: int = 3
    max_pixel_val: float = 1.0
    mask_prob: float = 0.15
    replace_prob: float = 0.5
    random_patch_prob: float = 0.5
    mean: Optional[Sequence[float]] = None
    std: Optional[Sequence[float]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jax.Array, training: bool = False) -> jax.Array:
        encoder = self.transformer
        img = jax.lax.stop_gradient(inputs)
        p = self.patch_size

        patches = rearrange(inputs, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                            p1=p, p2=p)
        batch, seq_len, patch_dim = patches.shape

        key = (self.make_rng("mask") if self.has_rng("mask")
               else jax.random.PRNGKey(0))
        k_subset, k_rand_prob, k_rand_idx, k_replace = jax.random.split(key, 4)

        mask = get_mask_subset_with_prob(batch, seq_len, self.mask_prob,
                                         k_subset)
        masked_input = jax.lax.stop_gradient(patches)

        if self.random_patch_prob > 0:
            random_patch_sampling_prob = (
                self.random_patch_prob / (1 - self.replace_prob))
            random_patch_prob = prob_mask_like(
                (batch, seq_len), random_patch_sampling_prob, k_rand_prob)
            bool_random_patch_prob = mask & random_patch_prob
            random_patches = jax.random.randint(
                k_rand_idx, (batch, seq_len), 0, seq_len)
            randomized_input = jnp.take_along_axis(
                masked_input, random_patches[..., None], axis=1)
            masked_input = jnp.where(bool_random_patch_prob[..., None],
                                     randomized_input, masked_input)

        mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                (1, 1, self.channels * self.patch_size ** 2))
        replace_prob = prob_mask_like((batch, seq_len), self.replace_prob,
                                      k_replace)
        bool_mask_replace = mask & replace_prob
        masked_input = jnp.where(bool_mask_replace[..., None],
                                 mask_token.astype(masked_input.dtype),
                                 masked_input)

        # embed through the encoder protocol (the reference spelunks
        # transformer.patch_embedding.layers[-1] — mpp.py:200)
        x = encoder.patch_to_emb(masked_input)
        b, n, _ = x.shape
        cls_tokens = repeat(encoder.cls_token.astype(x.dtype),
                            "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + encoder.pos_embedding[:, : (n + 1)].astype(x.dtype)
        x = encoder.emb_dropout_layer(x, deterministic=not training)
        x = encoder.transformer(x, training=training)

        logits = Dense(2 ** (self.output_channel_bits * self.channels),
                       dtype=self.dtype, name="to_bits")(x)
        logits = logits[:, 1:, :]

        return MPPLoss(self.patch_size, self.channels,
                       self.output_channel_bits, self.max_pixel_val,
                       self.mean, self.std, name="loss")(
            logits, img, mask, training=training)
