"""Training-objective wrappers (reference L6): MAE, SimMIM, MPP, DeiT
distillation — pure loss modules over (params, batch, key), jit end-to-end
with on-device masking (BASELINE.json)."""

from vit_tpu.objectives.distill import (
    DistillableEfficientViT,
    DistillableT2TViT,
    DistillableViT,
    DistillWrapper,
)
from vit_tpu.objectives.mae import MAE
from vit_tpu.objectives.mpp import MPP, MPPLoss
from vit_tpu.objectives.simmim import SimMIM

__all__ = [
    "MAE", "SimMIM", "MPP", "MPPLoss", "DistillWrapper",
    "DistillableViT", "DistillableT2TViT", "DistillableEfficientViT",
]
