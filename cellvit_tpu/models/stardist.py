"""CellViT-StarDist: ray-regression heads instead of HV maps.

Behavioral parity target: `models/segmentation/cell_segmentation/
cellvit_stardist.py:28-435` — same encoder + shared skip projections as
CellViT, with branches `stardist_map` (n_rays channels, ReLU),
`dist_map` (1 channel) and `nuclei_type_map`; postprocessing is polygon
NMS (`cellvit_tpu.ops.stardist_nms`) instead of watershed.

Torch-param naming parity: branch towers are `stardist_decoder`,
`dist_decoder`, `nuclei_type_maps_decoder`; the (unused on the ViT-256
path) `classifier_head` exists for SAM encoders.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cellvit_tpu.models.cellvit import (
    SAM_CONFIGS,
    UpsamplingBranch,
    setup_skip_decoders,
    setup_vit_encoder,
)

Dtype = Any


class CellViTStarDist(nn.Module):
    num_nuclei_classes: int
    num_tissue_classes: int
    embed_dim: int
    depth: int
    num_heads: int
    extract_layers: Sequence[int]
    encoder_type: str = "histo"
    nrays: int = 32
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    global_attn_indexes: Sequence[int] = ()
    window_size: int = 14
    prompt_embed_dim: int = 256
    patch_size: int = 16
    remat: bool = False
    dtype: Dtype = jnp.float32

    @property
    def skip_dims(self):
        if self.embed_dim < 512:
            return 256, 128, 312
        return 512, 256, 512

    def setup(self):
        assert len(self.extract_layers) == 4
        setup_vit_encoder(self)
        setup_skip_decoders(self)
        self._setup_branches()

    def _setup_branches(self):
        """Branch towers; overridden by CPP-Net (feature towers + heads)."""
        _, _, bott = self.skip_dims
        d, dt = self.drop_rate, self.dtype
        self.stardist_decoder = UpsamplingBranch(self.nrays, bott, dropout=d, dtype=dt)
        self.dist_decoder = UpsamplingBranch(1, bott, dropout=d, dtype=dt)
        self.nuclei_type_maps_decoder = UpsamplingBranch(
            self.num_nuclei_classes, bott, dropout=d, dtype=dt
        )

    def _tokens_to_grid(self, z, ht, wt):
        if self.encoder_type == "histo":
            z = z[:, 1:, :]
            return z.reshape(z.shape[0], ht, wt, z.shape[-1])
        return z

    def _shared_skips(self, x, skips, train):
        ht, wt = x.shape[1] // self.patch_size, x.shape[2] // self.patch_size
        z1, z2, z3, z4 = (self._tokens_to_grid(z, ht, wt) for z in skips)
        p0 = x.astype(self.dtype)
        for conv in self.decoder0:
            p0 = conv(p0, train=train)
        p1 = z1
        for blk in self.decoder1:
            p1 = blk(p1, train=train)
        p2 = z2
        for blk in self.decoder2:
            p2 = blk(p2, train=train)
        p3 = z3
        for blk in self.decoder3:
            p3 = blk(p3, train=train)
        return p0, p1, p2, p3, z4

    def __call__(
        self, x: jax.Array, *, train: bool = False, retrieve_tokens: bool = False
    ) -> Dict[str, jax.Array]:
        assert x.shape[1] % self.patch_size == 0 and x.shape[2] % self.patch_size == 0
        out: Dict[str, jax.Array] = {}
        if self.encoder_type == "histo":
            cls_logits, _, skips = self.encoder(x, train=train)
            out["tissue_types"] = cls_logits
        else:
            pooled, _, skips = self.encoder(x)
            out["tissue_types"] = self.classifier_head(pooled)
        p0, p1, p2, p3, z4 = self._shared_skips(x, skips, train)
        out["stardist_map"] = nn.relu(
            self.stardist_decoder(p0, p1, p2, p3, z4, train=train)
        )
        out["dist_map"] = self.dist_decoder(p0, p1, p2, p3, z4, train=train)
        out["nuclei_type_map"] = self.nuclei_type_maps_decoder(
            p0, p1, p2, p3, z4, train=train
        )
        if retrieve_tokens:
            out["tokens"] = z4
        return out


def CellViT256StarDist(
    num_nuclei_classes: int, num_tissue_classes: int, nrays: int = 32,
    drop_rate: float = 0.0, dtype: Dtype = jnp.float32, **kw,
) -> CellViTStarDist:
    """ViT-256 preset (reference cellvit_stardist.py:249-303)."""
    return CellViTStarDist(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        embed_dim=384, depth=12, num_heads=6, extract_layers=(3, 6, 9, 12),
        encoder_type="histo", nrays=nrays, drop_rate=drop_rate, dtype=dtype,
        **kw,
    )


def CellViTSAMStarDist(
    num_nuclei_classes: int, num_tissue_classes: int, vit_structure: str,
    nrays: int = 32, drop_rate: float = 0.0, dtype: Dtype = jnp.float32, **kw,
) -> CellViTStarDist:
    """SAM preset (reference cellvit_stardist.py:306-433)."""
    cfg = SAM_CONFIGS[vit_structure.upper()]
    return CellViTStarDist(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        encoder_type="sam", nrays=nrays, drop_rate=drop_rate, dtype=dtype,
        **cfg, **kw,
    )
