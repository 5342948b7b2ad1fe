"""Shared-decoder CellViT variants: one decoder tower, 1×1 heads per branch.

Behavioral parity target: `models/segmentation/cell_segmentation/
cellvit_shared.py:23-556` (CellViTShared + ViT256/SAM presets) and
`cellvit_stardist_shared.py:28-560`. One upsampling tower (own skip
projections, torch names decoder{0..3}_skip / decoder{3,2,1}_upsampler /
decoder0_header) feeds per-branch 1×1 convolutions named like the
reference's branch decoders.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cellvit_tpu.models.cellvit import SAM_CONFIGS, setup_vit_encoder
from cellvit_tpu.models.layers import ConvBNRelu, ConvTranspose2x2, DeconvBlock

Dtype = Any


class SharedDecoderTower(nn.Module):
    """Single tower: skip projections + fuse/upsample stages → 64-ch map."""

    embed_dim: int
    skip_dim_11: int
    skip_dim_12: int
    bottleneck_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        d, dt = self.dropout, self.dtype
        self.decoder0_skip = [
            ConvBNRelu(32, dropout=d, dtype=dt),
            ConvBNRelu(64, dropout=d, dtype=dt),
        ]
        self.decoder1_skip = [
            DeconvBlock(self.skip_dim_11, dropout=d, dtype=dt),
            DeconvBlock(self.skip_dim_12, dropout=d, dtype=dt),
            DeconvBlock(128, dropout=d, dtype=dt),
        ]
        self.decoder2_skip = [
            DeconvBlock(self.skip_dim_11, dropout=d, dtype=dt),
            DeconvBlock(256, dropout=d, dtype=dt),
        ]
        self.decoder3_skip = [DeconvBlock(self.bottleneck_dim, dropout=d, dtype=dt)]
        self.bottleneck_upsampler = ConvTranspose2x2(
            self.bottleneck_dim, dtype=dt, name="bottleneck_upsampler"
        )
        self.d3_convs = [
            ConvBNRelu(self.bottleneck_dim, dropout=d, dtype=dt) for _ in range(3)
        ]
        self.d3_up = ConvTranspose2x2(256, dtype=dt)
        self.d2_convs = [ConvBNRelu(256, dropout=d, dtype=dt) for _ in range(2)]
        self.d2_up = ConvTranspose2x2(128, dtype=dt)
        self.d1_convs = [ConvBNRelu(128, dropout=d, dtype=dt) for _ in range(2)]
        self.d1_up = ConvTranspose2x2(64, dtype=dt)
        self.d0_convs = [ConvBNRelu(64, dropout=d, dtype=dt) for _ in range(2)]

    def __call__(self, x, z1, z2, z3, z4, *, train: bool = False):
        p0 = x
        for blk in self.decoder0_skip:
            p0 = blk(p0, train=train)
        p1 = z1
        for blk in self.decoder1_skip:
            p1 = blk(p1, train=train)
        p2 = z2
        for blk in self.decoder2_skip:
            p2 = blk(p2, train=train)
        p3 = z3
        for blk in self.decoder3_skip:
            p3 = blk(p3, train=train)

        b = self.bottleneck_upsampler(z4)
        b = jnp.concatenate([p3, b], axis=-1)
        for conv in self.d3_convs:
            b = conv(b, train=train)
        b = self.d3_up(b)
        b = jnp.concatenate([p2, b], axis=-1)
        for conv in self.d2_convs:
            b = conv(b, train=train)
        b = self.d2_up(b)
        b = jnp.concatenate([p1, b], axis=-1)
        for conv in self.d1_convs:
            b = conv(b, train=train)
        b = self.d1_up(b)
        b = jnp.concatenate([p0, b], axis=-1)
        for conv in self.d0_convs:
            b = conv(b, train=train)
        return b


class CellViTShared(nn.Module):
    """HoVer-Net heads over one shared decoder tower."""

    num_nuclei_classes: int
    num_tissue_classes: int
    embed_dim: int
    depth: int
    num_heads: int
    extract_layers: Sequence[int]
    encoder_type: str = "histo"
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    regression_loss: bool = False
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
        dt = self.dtype
        setup_vit_encoder(self)
        s11, s12, bott = self.skip_dims
        self.decoder = SharedDecoderTower(
            self.embed_dim, s11, s12, bott, dropout=self.drop_rate, dtype=dt,
            name="decoder",
        )
        offset = 2 if self.regression_loss else 0
        self.nuclei_binary_map_decoder = nn.Conv(
            2 + offset, (1, 1), dtype=dt, name="nuclei_binary_map_decoder"
        )
        self.hv_map_decoder = nn.Conv(2, (1, 1), dtype=dt, name="hv_map_decoder")
        self.nuclei_type_maps_decoder = nn.Conv(
            self.num_nuclei_classes, (1, 1), dtype=dt,
            name="nuclei_type_maps_decoder",
        )

    def _tokens_to_grid(self, z, ht, wt):
        if self.encoder_type == "histo":
            z = z[:, 1:, :]
            return z.reshape(z.shape[0], ht, wt, z.shape[-1])
        return z

    def __call__(
        self, x: jax.Array, *, train: bool = False, retrieve_tokens: bool = False
    ) -> Dict[str, jax.Array]:
        assert x.shape[1] % self.patch_size == 0 and x.shape[2] % self.patch_size == 0
        ht, wt = x.shape[1] // self.patch_size, x.shape[2] // self.patch_size
        out: Dict[str, jax.Array] = {}
        if self.encoder_type == "histo":
            cls_logits, _, skips = self.encoder(x, train=train)
            out["tissue_types"] = cls_logits
        else:
            pooled, _, skips = self.encoder(x)
            out["tissue_types"] = self.classifier_head(pooled)
        z1, z2, z3, z4 = (self._tokens_to_grid(z, ht, wt) for z in skips)
        feats = self.decoder(x.astype(self.dtype), z1, z2, z3, z4, train=train)
        nb = self.nuclei_binary_map_decoder(feats)
        if self.regression_loss:
            out["nuclei_binary_map"] = nb[..., :2]
            out["regression_map"] = nb[..., 2:]
        else:
            out["nuclei_binary_map"] = nb
        out["hv_map"] = self.hv_map_decoder(feats)
        out["nuclei_type_map"] = self.nuclei_type_maps_decoder(feats)
        if retrieve_tokens:
            out["tokens"] = z4
        return out


class CellViTStarDistShared(CellViTShared):
    """StarDist heads over the shared tower
    (reference cellvit_stardist_shared.py:28-379: `stardist_header`
    (1×1 conv + ReLU), `dist_header` (1×1 conv), type head)."""

    nrays: int = 32

    def setup(self):
        assert len(self.extract_layers) == 4
        dt = self.dtype
        setup_vit_encoder(self)
        s11, s12, bott = self.skip_dims
        self.decoder = SharedDecoderTower(
            self.embed_dim, s11, s12, bott, dropout=self.drop_rate, dtype=dt,
            name="decoder",
        )
        self.stardist_header = nn.Conv(
            self.nrays, (1, 1), dtype=dt, name="stardist_header"
        )
        self.dist_header = nn.Conv(1, (1, 1), dtype=dt, name="dist_header")
        self.nuclei_type_maps_header = nn.Conv(
            self.num_nuclei_classes, (1, 1), dtype=dt,
            name="nuclei_type_maps_header",
        )

    def __call__(self, x, *, train: bool = False, retrieve_tokens: bool = False):
        assert x.shape[1] % self.patch_size == 0 and x.shape[2] % self.patch_size == 0
        ht, wt = x.shape[1] // self.patch_size, x.shape[2] // self.patch_size
        out: Dict[str, jax.Array] = {}
        if self.encoder_type == "histo":
            cls_logits, _, skips = self.encoder(x, train=train)
            out["tissue_types"] = cls_logits
        else:
            pooled, _, skips = self.encoder(x)
            out["tissue_types"] = self.classifier_head(pooled)
        z1, z2, z3, z4 = (self._tokens_to_grid(z, ht, wt) for z in skips)
        feats = self.decoder(x.astype(self.dtype), z1, z2, z3, z4, train=train)
        out["stardist_map"] = nn.relu(self.stardist_header(feats))
        out["dist_map"] = self.dist_header(feats)
        out["nuclei_type_map"] = self.nuclei_type_maps_header(feats)
        if retrieve_tokens:
            out["tokens"] = z4
        return out


def CellViT256Shared(num_nuclei_classes, num_tissue_classes, **kw):
    """ViT-256 shared-decoder preset (reference cellvit_shared.py:333-394)."""
    return CellViTShared(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        embed_dim=384, depth=12, num_heads=6, extract_layers=(3, 6, 9, 12),
        encoder_type="histo", **kw,
    )


def CellViTSAMShared(num_nuclei_classes, num_tissue_classes, vit_structure, **kw):
    """SAM shared-decoder preset (reference cellvit_shared.py:396-556)."""
    cfg = SAM_CONFIGS[vit_structure.upper()]
    return CellViTShared(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        encoder_type="sam", **cfg, **kw,
    )


def CellViT256StarDistShared(num_nuclei_classes, num_tissue_classes, nrays=32, **kw):
    return CellViTStarDistShared(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        embed_dim=384, depth=12, num_heads=6, extract_layers=(3, 6, 9, 12),
        encoder_type="histo", nrays=nrays, **kw,
    )


def CellViTSAMStarDistShared(
    num_nuclei_classes, num_tissue_classes, vit_structure, nrays=32, **kw
):
    cfg = SAM_CONFIGS[vit_structure.upper()]
    return CellViTStarDistShared(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        encoder_type="sam", nrays=nrays, **cfg, **kw,
    )
