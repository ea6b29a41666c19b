"""vit-tpu: TPU-native vision-transformer framework (JAX/XLA/Pallas/pjit).

Full capability surface of taki0112/vit-tensorflow with a working top-level
namespace (the reference README advertises ``from vit_tensorflow import ViT``
but ships no ``__init__.py`` — reference README.md:47, SURVEY.md §8.12).
Exports grow as model families land; see ``vit_tpu.models``.
"""

from vit_tpu.models.cait import CaiT
from vit_tpu.models.cct import CCT, cct_2, cct_4, cct_6, cct_7, cct_8, cct_14, cct_16
from vit_tpu.models.cross_vit import CrossViT
from vit_tpu.models.deepvit import DeepViT
from vit_tpu.models.pit import PiT
from vit_tpu.models.t2t import T2TViT
from vit_tpu.models.vit import ViT
from vit_tpu.models.vit_for_small_dataset import LSA, SPT
from vit_tpu.models.vit_with_patch_merger import PatchMerger

__all__ = ["ViT", "DeepViT", "CaiT", "CrossViT", "SPT", "LSA",
           "PatchMerger", "T2TViT", "PiT", "CCT",
           "cct_2", "cct_4", "cct_6", "cct_7", "cct_8", "cct_14", "cct_16"]

__version__ = "0.1.0"
