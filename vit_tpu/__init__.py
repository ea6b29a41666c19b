"""vit-tpu: TPU-native vision-transformer framework (JAX/XLA/Pallas/pjit).

Full capability surface of taki0112/vit-tensorflow with a working top-level
namespace (the reference README advertises ``from vit_tensorflow import ViT``
but ships no ``__init__.py`` — reference README.md:47, SURVEY.md §8.12).

All 20 model constructors keep the reference's public kwargs; classes whose
reference file names them ``ViT`` (efficient, parallel_vit, ats_vit,
vit_for_small_dataset, vit_with_patch_merger) are importable via their
module under ``vit_tpu.models``.
"""

from vit_tpu.core.bind import BoundModel, bind
from vit_tpu.core.helpers import cast_params
from vit_tpu.models.cait import CaiT
from vit_tpu.models.cct import CCT, cct_2, cct_4, cct_6, cct_7, cct_8, cct_14, cct_16
from vit_tpu.models.cross_vit import CrossViT
from vit_tpu.models.crossformer import CrossFormer
from vit_tpu.models.cvt import CvT
from vit_tpu.models.deepvit import DeepViT
from vit_tpu.models.levit import LeViT
from vit_tpu.models.mobile_vit import MobileViT
from vit_tpu.models.nest import NesT
from vit_tpu.models.pit import PiT
from vit_tpu.models.regionvit import RegionViT
from vit_tpu.models.scalable_vit import ScalableViT
from vit_tpu.models.t2t import T2TViT
from vit_tpu.models.twins_svt import TwinsSVT
from vit_tpu.models.vit import ViT
from vit_tpu.models.vit_for_small_dataset import LSA, SPT
from vit_tpu.models.vit_with_patch_merger import PatchMerger
from vit_tpu.objectives.distill import (DistillableEfficientViT,
                                        DistillableT2TViT, DistillableViT,
                                        DistillWrapper)
from vit_tpu.objectives.mae import MAE
from vit_tpu.objectives.mpp import MPP
from vit_tpu.objectives.simmim import SimMIM

def enable_compile_cache(path: str = "~/.cache/vit_tpu_jax"):
    """Turn on JAX's persistent compilation cache at ``path``.

    The fused Pallas kernels cost one slow remote Mosaic compile per
    distinct (shape, kernel) pair on first use (a cold hierarchical model
    can take tens of minutes on a remote-compile TPU frontend); with the
    cache every later process launch reuses them in seconds.  Call once
    before any jit.  bench.py / benchmarks/run_benchmarks.py do the
    equivalent with a repo-local cache dir.
    """
    import os

    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


__all__ = [
    "bind", "BoundModel", "cast_params", "enable_compile_cache",
    "ViT", "DeepViT", "CaiT", "CrossViT", "SPT", "LSA", "PatchMerger",
    "T2TViT", "PiT", "CCT", "LeViT", "CvT", "TwinsSVT", "CrossFormer",
    "RegionViT", "ScalableViT", "NesT", "MobileViT",
    "cct_2", "cct_4", "cct_6", "cct_7", "cct_8", "cct_14", "cct_16",
    "MAE", "SimMIM", "MPP", "DistillWrapper",
    "DistillableViT", "DistillableT2TViT", "DistillableEfficientViT",
]

__version__ = "0.1.0"
