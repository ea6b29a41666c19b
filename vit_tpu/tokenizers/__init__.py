"""Tokenizers / embedders (SURVEY.md §2 L4) — facade over the per-model
implementations.

Each tokenizer lives next to the model family that defines its semantics
(parity citations there); this module is the single import point:

- linear patchify: :func:`vit_tpu.ops.patchify.patchify` (+ the ViT
  ``patch_embedding`` GEMM)
- unfold tokenizers: :func:`vit_tpu.ops.patchify.extract_patches`
  (``tf.image.extract_patches`` semantics; T2T/PiT)
- shifted-patch tokenization: :class:`SPT`
- conv stems: LeViT ``conv_embedding_*``, CCT tokenizer (inside
  :class:`vit_tpu.models.cct.CCT`), MobileViT ``ConvNxNBN``
- cross-scale embedding: :class:`CrossEmbedLayer`
- patch-merge embedding: :class:`PatchEmbedding` (Twins-SVT)
- region/local encoders: inside :class:`vit_tpu.models.regionvit.RegionViT`
"""

from vit_tpu.models.crossformer import CrossEmbedLayer
from vit_tpu.models.mobile_vit import ConvNxNBN
from vit_tpu.models.twins_svt import PatchEmbedding
from vit_tpu.models.vit_for_small_dataset import SPT
from vit_tpu.ops.patchify import extract_patches, patchify, unpatchify

__all__ = [
    "patchify", "unpatchify", "extract_patches",
    "SPT", "CrossEmbedLayer", "PatchEmbedding", "ConvNxNBN",
]
