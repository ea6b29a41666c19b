"""vit-tpu: TPU-native vision-transformer framework (JAX/XLA/Pallas/pjit).

Full capability surface of taki0112/vit-tensorflow with a working top-level
namespace (the reference README advertises ``from vit_tensorflow import ViT``
but ships no ``__init__.py`` — reference README.md:47, SURVEY.md §8.12).
Exports grow as model families land; see ``vit_tpu.models``.
"""

from vit_tpu.models.vit import ViT

__all__ = ["ViT"]

__version__ = "0.1.0"
