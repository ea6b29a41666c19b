"""DeiT-style knowledge distillation
(parity target: reference distill.py:16-134).

``Distillable{ViT,T2TViT,EfficientViT}`` append a learnable distillation
token after the pos-embedded sequence (dropout applied after the concat,
matching the mixin order — reference distill.py:26-30), and return
``(logits, distill_tokens)`` when a distill token is passed.

``DistillWrapper`` combines CE on the student logits with a distillation
term from a separate LayerNorm+Dense head over the distill token; the
teacher runs under ``stop_gradient``.

Divergences, paper-correct (SURVEY.md §8.8):
* hard mode — the reference feeds integer argmax labels to *dense*
  ``categorical_crossentropy``; here it is sparse CE on the teacher argmax.
* soft mode — the reference passes log-probabilities into Keras
  ``KLDivergence`` (which expects probabilities); here it is the DeiT
  formula ``KL(softmax(t/T) ‖ softmax(d/T)) · T²`` with batch-mean
  reduction.
* the wrapper returns the scalar mean loss (the reference returns a
  per-sample vector broadcast against the scalar distill term).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from einops import repeat
from flax import linen as nn

from vit_tpu.layers.common import Dense, LayerNorm, Transformer
from vit_tpu.models.efficient import ViT as EfficientViT
from vit_tpu.models.t2t import T2TViT
from vit_tpu.models.vit import ViT
from vit_tpu.ops.patchify import extract_patches, patchify


class DistillableViT(ViT):
    """Reference distill.py:47-58."""

    def __call__(self, img, distill_token=None, training: bool = False):
        distilling = distill_token is not None

        x = self.patch_to_emb(self.to_patch(img))
        b, n, _ = x.shape
        cls_tokens = repeat(self.cls_token.astype(x.dtype),
                            "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + self.pos_embedding[:, : (n + 1)].astype(x.dtype)

        if distilling:
            distill_tokens = repeat(distill_token.astype(x.dtype),
                                    "() n d -> b n d", b=b)
            x = jnp.concatenate([x, distill_tokens], axis=1)

        # _attend: dropout then transformer (distill.py:55-58)
        x = self.emb_dropout_layer(x, deterministic=not training)
        x = self.transformer(x, training=training)

        if distilling:
            x, distill_tokens = x[:, :-1], x[:, -1]

        if self.pool == "mean":
            pooled = jnp.mean(x, axis=1)
        else:
            pooled = x[:, 0]
        out = self.head(self.head_norm(pooled))

        if distilling:
            return out, distill_tokens
        return out


class DistillableT2TViT(T2TViT):
    """Reference distill.py:61-72."""

    @nn.compact
    def __call__(self, img, distill_token=None, training: bool = False):
        import math

        from vit_tpu.models.t2t import same_output_size

        distilling = distill_token is not None
        layer_dim = self.channels
        output_image_size = self.image_size

        x = img
        for i, (kernel_size, stride) in enumerate(self.t2t_layers):
            layer_dim *= kernel_size ** 2
            is_first = i == 0
            is_last = i == len(self.t2t_layers) - 1
            if not is_first:
                h = int(math.sqrt(x.shape[1]))
                x = x.reshape(x.shape[0], h, h, x.shape[-1])
            x = extract_patches(x, kernel_size, stride, padding="SAME")
            x = x.reshape(x.shape[0], -1, x.shape[-1])
            output_image_size = same_output_size(output_image_size, stride)
            if not is_last:
                x = Transformer(
                    dim=layer_dim, depth=1, heads=1, dim_head=layer_dim,
                    mlp_dim=layer_dim, dropout=self.dropout, dtype=self.dtype,
                    name=f"t2t_transformer_{i}",
                )(x, training=training)

        x = Dense(self.dim, dtype=self.dtype, name="patch_embedding")(x)
        b, n, _ = x.shape
        num_patches = output_image_size ** 2

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches + 1, self.dim))
        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos_embedding[:, : (n + 1)].astype(x.dtype)

        if distilling:
            distill_tokens = repeat(distill_token.astype(x.dtype),
                                    "() n d -> b n d", b=b)
            x = jnp.concatenate([x, distill_tokens], axis=1)

        x = nn.Dropout(self.emb_dropout)(x, deterministic=not training)
        if self.transformer is not None:
            x = self.transformer(x, training=training)
        else:
            x = Transformer(
                self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
                dropout=self.dropout, dtype=self.dtype, name="transformer",
            )(x, training=training)

        if distilling:
            x, distill_tokens = x[:, :-1], x[:, -1]

        if self.pool == "mean":
            pooled = jnp.mean(x, axis=1)
        else:
            pooled = x[:, 0]
        out = Dense(self.num_classes, dtype=self.dtype, name="head")(
            LayerNorm(dtype=self.dtype, name="head_norm")(pooled))

        if distilling:
            return out, distill_tokens
        return out


class DistillableEfficientViT(EfficientViT):
    """Reference distill.py:74-85."""

    @nn.compact
    def __call__(self, img, distill_token=None, training: bool = False):
        from vit_tpu.core.helpers import pair

        distilling = distill_token is not None
        h, w = pair(self.image_size)
        num_patches = (h // self.patch_size) * (w // self.patch_size)

        x = patchify(img, self.patch_size, self.patch_size)
        x = Dense(self.dim, dtype=self.dtype, name="patch_embedding")(x)
        b, n, _ = x.shape

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, num_patches + 1, self.dim))
        cls_tokens = repeat(cls_token.astype(x.dtype), "() n d -> b n d", b=b)
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos_embedding[:, : (n + 1)].astype(x.dtype)

        if distilling:
            distill_tokens = repeat(distill_token.astype(x.dtype),
                                    "() n d -> b n d", b=b)
            x = jnp.concatenate([x, distill_tokens], axis=1)

        x = self.transformer(x, training=training)

        if distilling:
            x, distill_tokens = x[:, :-1], x[:, -1]

        if self.pool == "mean":
            pooled = jnp.mean(x, axis=1)
        else:
            pooled = x[:, 0]
        out = Dense(self.num_classes, dtype=self.dtype, name="head")(
            LayerNorm(dtype=self.dtype, name="head_norm")(pooled))

        if distilling:
            return out, distill_tokens
        return out


class DistillWrapper(nn.Module):
    """Constructor parity: reference distill.py:88."""

    teacher: nn.Module
    student: nn.Module
    temperature: float = 1.0
    alpha: float = 0.5
    hard: bool = False
    dtype: Any = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        assert isinstance(
            self.student,
            (DistillableViT, DistillableT2TViT, DistillableEfficientViT),
        ), "student must be a vision transformer"

    @nn.compact
    def __call__(self, inputs, temperature: Optional[float] = None,
                 alpha: Optional[float] = None, training: bool = False):
        img, labels = inputs
        alpha = alpha if alpha is not None else self.alpha
        T = temperature if temperature is not None else self.temperature

        teacher_logits = jax.lax.stop_gradient(
            self.teacher(img, training=training))

        distillation_token = self.param(
            "distillation_token", nn.initializers.normal(1.0),
            (1, 1, self.student.dim))
        student_logits, distill_tokens = self.student(
            img, distill_token=distillation_token, training=training)

        distill_logits = Dense(
            self.student.num_classes, dtype=self.dtype, name="distill_head",
        )(LayerNorm(dtype=self.dtype, name="distill_norm")(distill_tokens))

        student_logp = jax.nn.log_softmax(
            student_logits.astype(jnp.float32), axis=-1)
        labels = jnp.asarray(labels)
        if labels.ndim == 1:  # integer labels → sparse CE
            ce = -jnp.take_along_axis(student_logp, labels[:, None],
                                      axis=-1)[:, 0]
        else:  # one-hot labels (the reference's documented usage)
            ce = -jnp.sum(labels.astype(jnp.float32) * student_logp, axis=-1)
        loss = jnp.mean(ce)

        if not self.hard:
            # DeiT soft distillation: KL(softmax(t/T) ‖ softmax(d/T)) · T²
            t_prob = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T,
                                    axis=-1)
            d_logp = jax.nn.log_softmax(
                distill_logits.astype(jnp.float32) / T, axis=-1)
            kl = jnp.sum(t_prob * (jnp.log(t_prob + 1e-12) - d_logp), axis=-1)
            distill_loss = jnp.mean(kl) * (T ** 2)
        else:
            # sparse CE on teacher argmax (§8.8 fix)
            teacher_labels = jnp.argmax(teacher_logits, axis=-1)
            d_logp = jax.nn.log_softmax(
                distill_logits.astype(jnp.float32), axis=-1)
            distill_loss = jnp.mean(
                -jnp.take_along_axis(d_logp, teacher_labels[:, None],
                                     axis=-1)[:, 0])

        return loss * (1 - alpha) + distill_loss * alpha
