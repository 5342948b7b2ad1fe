"""Model zoo: ViT encoders and CellViT segmentation heads (flax.linen, NHWC).

Families (reference §2.3 inventory):
  CellViT / CellViT256 / CellViTSAM            — HoVer-Net heads
  CellViTShared / …256Shared / …SAMShared      — shared decoder tower
  CellViTStarDist / …256 / …SAM (+shared)      — StarDist ray heads
  CellViTCPP / …256 / …SAM                     — CPP-Net refinement
  StarDistRN50                                 — ResNet50 baseline
"""

from cellvit_tpu.models.cellvit import (  # noqa: F401
    CellViT,
    CellViT256,
    CellViTSAM,
)
from cellvit_tpu.models.cpp_net import (  # noqa: F401
    CellViT256CPP,
    CellViTCPP,
    CellViTSAMCPP,
)
from cellvit_tpu.models.shared import (  # noqa: F401
    CellViT256Shared,
    CellViT256StarDistShared,
    CellViTSAMShared,
    CellViTSAMStarDistShared,
    CellViTShared,
    CellViTStarDistShared,
)
from cellvit_tpu.models.stardist import (  # noqa: F401
    CellViT256StarDist,
    CellViTSAMStarDist,
    CellViTStarDist,
)
from cellvit_tpu.models.stardist_rn50 import StarDistRN50  # noqa: F401
from cellvit_tpu.models.storage import (  # noqa: F401
    DataclassCPPStorage,
    DataclassHVStorage,
    DataclassStarDistStorage,
)
