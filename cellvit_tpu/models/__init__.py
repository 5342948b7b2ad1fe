"""Model zoo: ViT encoders and CellViT segmentation heads (flax.linen, NHWC)."""

from cellvit_tpu.models.cellvit import (  # noqa: F401
    CellViT,
    CellViT256,
    CellViTSAM,
)
