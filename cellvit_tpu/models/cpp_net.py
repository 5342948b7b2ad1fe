"""CellViT-CPP-Net: StarDist rays + context-point refinement.

Behavioral parity target: `models/segmentation/cell_segmentation/
cellvit_cpp_net.py:167-631`: three 32-feature decoder towers with bias-free
1×1 heads (stardist/dist/type), a per-ray confidence conv, ray-wise feature
sampling along eroded ray fractions (0.2…1.0) and a confidence-softmax
weighted refined ray map. Sampling runs as a channel-last JAX gather
(`cellvit_tpu.ops.ray_sampling`) instead of torch grid_sample.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cellvit_tpu.models.cellvit import SAM_CONFIGS
from cellvit_tpu.models.stardist import CellViTStarDist
from cellvit_tpu.models.cellvit import UpsamplingBranch
from cellvit_tpu.ops.ray_sampling import sample_rays

Dtype = Any


class CellViTCPP(CellViTStarDist):
    erosion_factors: Tuple[float, ...] = (0.2, 0.4, 0.6, 0.8, 1.0)

    def _setup_branches(self):
        """CPP layout: 32-feature towers (torch names kept) + 1×1 heads +
        confidence refinement (reference cellvit_cpp_net.py:246-279)."""
        dt = self.dtype
        d = self.drop_rate
        _, _, bott = self.skip_dims
        self.stardist_decoder = UpsamplingBranch(32, bott, dropout=d, dtype=dt)
        self.dist_decoder = UpsamplingBranch(32, bott, dropout=d, dtype=dt)
        self.nuclei_type_maps_decoder = UpsamplingBranch(
            32, bott, dropout=d, dtype=dt
        )
        self.stardist_head = nn.Conv(
            self.nrays, (1, 1), use_bias=False, dtype=dt, name="stardist_head"
        )
        self.dist_head = nn.Conv(1, (1, 1), use_bias=False, dtype=dt, name="dist_head")
        self.type_head = nn.Conv(
            self.num_nuclei_classes, (1, 1), use_bias=False, dtype=dt,
            name="type_head",
        )
        self.conv_0_confidence = nn.Conv(
            self.nrays, (1, 1), use_bias=False, dtype=dt, name="conv_0_confidence"
        )
        self.conv_1_confidence = nn.Dense(
            1 + len(self.erosion_factors), dtype=dt, name="conv_1_confidence"
        )

    def cppnet_refine(
        self, stardist_map: jax.Array, features: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Refine rays (reference cppnet_refine, cellvit_cpp_net.py:283-335).

        Args:
            stardist_map: (B, H, W, nrays) raw ray predictions.
            features: (B, H, W, 32) stardist tower features.
        Returns:
            (refined rays (B, H, W, nrays), confidences (B, H, W, nrays, K)).
        """
        out_confidence = self.conv_0_confidence(features)  # (B, H, W, nrays)
        rays = [stardist_map]
        confs = [out_confidence]
        for e in self.erosion_factors:
            base_dist = (stardist_map - 1.0) * e
            ray_sampled = sample_rays(stardist_map, base_dist)
            conf_sampled = sample_rays(out_confidence, base_dist)
            rays.append(ray_sampled + base_dist)
            confs.append(conf_sampled)
        rays = jnp.stack(rays, axis=-1)  # (B, H, W, nrays, K)
        confs = jnp.stack(confs, axis=-1)
        # 1×1 conv over the K axis per ray channel (torch reshapes to
        # (b·c, k, h, w) and applies Conv2d(k, k, 1))
        confs = self.conv_1_confidence(confs)
        confs = jax.nn.softmax(confs, axis=-1)
        refined = jnp.sum(rays * confs, axis=-1)
        return nn.relu(refined), confs

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

        stardist_features = self.stardist_decoder(p0, p1, p2, p3, z4, train=train)
        dist_features = self.dist_decoder(p0, p1, p2, p3, z4, train=train)
        type_features = self.nuclei_type_maps_decoder(p0, p1, p2, p3, z4, train=train)

        stardist_map = self.stardist_head(stardist_features)
        out["stardist_map"] = stardist_map
        out["dist_map"] = self.dist_head(dist_features)
        out["nuclei_type_map"] = self.type_head(type_features)
        refined, _ = self.cppnet_refine(stardist_map, stardist_features)
        out["stardist_map_refined"] = refined
        if retrieve_tokens:
            out["tokens"] = z4
        return out


def CellViT256CPP(
    num_nuclei_classes: int, num_tissue_classes: int, nrays: int = 32,
    drop_rate: float = 0.0, dtype: Dtype = jnp.float32, **kw,
) -> CellViTCPP:
    """ViT-256 preset (reference cellvit_cpp_net.py:429-484)."""
    return CellViTCPP(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        embed_dim=384, depth=12, num_heads=6, extract_layers=(3, 6, 9, 12),
        encoder_type="histo", nrays=nrays, drop_rate=drop_rate, dtype=dtype,
        **kw,
    )


def CellViTSAMCPP(
    num_nuclei_classes: int, num_tissue_classes: int, vit_structure: str,
    nrays: int = 32, drop_rate: float = 0.0, dtype: Dtype = jnp.float32, **kw,
) -> CellViTCPP:
    """SAM preset (reference cellvit_cpp_net.py:486-631)."""
    cfg = SAM_CONFIGS[vit_structure.upper()]
    return CellViTCPP(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        encoder_type="sam", nrays=nrays, drop_rate=drop_rate, dtype=dtype,
        **cfg, **kw,
    )
