"""CellViT: U-Net with ViT encoder and HoVer-Net-style multi-branch decoders.

Behavioral parity target: `models/segmentation/cell_segmentation/cellvit.py`
in the reference (CellViT:26-426, CellViT256:428-493, CellViTSAM:496-665).
Shared skip projections (decoder0..3) feed three per-branch upsampling towers
(nuclei binary / HV / nuclei type); tissue classification comes from the CLS
token (ViT-256) or the mean-pooled SAM neck.

All tensors are NHWC. Channel schedules match the reference exactly so torch
checkpoints map 1:1:
  embed<512 → skip dims (256, 128), bottleneck 312; else (512, 256), 512
  towers: bottleneck → 256 → 128 → 64 → num_classes, ConvT 2×2/s2 between.

One intentional behavioral difference: the shared skip projections are
computed once and reused by all branches (the reference re-runs the shared
modules inside every branch — identical outputs, 3× the FLOPs; only
distinguishable when dropout>0 during training).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cellvit_tpu.models.layers import ConvBNRelu, ConvTranspose2x2, DeconvBlock
from cellvit_tpu.models.sam_vit import SamViT
from cellvit_tpu.models.vit import HistoViT

Dtype = Any


class UpsamplingBranch(nn.Module):
    """One decoder tower: bottleneck ConvT + 4 fuse/upsample stages.

    Mirrors `CellViT.create_upsampling_branch` (reference cellvit.py:246-330).
    Inputs are the shared projected skips (p0..p3) and the bottleneck z4.
    """

    num_classes: int
    bottleneck_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        d, dt = self.dropout, self.dtype
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
        self.header = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="header")

    def __call__(
        self,
        p0: jax.Array,
        p1: jax.Array,
        p2: jax.Array,
        p3: jax.Array,
        z4: jax.Array,
        *,
        train: bool = False,
    ) -> jax.Array:
        x = self.bottleneck_upsampler(z4)
        x = jnp.concatenate([p3, x], axis=-1)
        for conv in self.d3_convs:
            x = conv(x, train=train)
        x = self.d3_up(x)
        x = jnp.concatenate([p2, x], axis=-1)
        for conv in self.d2_convs:
            x = conv(x, train=train)
        x = self.d2_up(x)
        x = jnp.concatenate([p1, x], axis=-1)
        for conv in self.d1_convs:
            x = conv(x, train=train)
        x = self.d1_up(x)
        x = jnp.concatenate([p0, x], axis=-1)
        for conv in self.d0_convs:
            x = conv(x, train=train)
        return self.header(x)


def setup_vit_encoder(model: nn.Module) -> None:
    """Build `model.encoder` (+ `model.classifier_head` for SAM).

    Shared by every CellViT-family `Module.setup()` (HV / StarDist / CPP /
    shared-decoder): the attribute names are part of the checkpoint
    contract, so constructing them in one place keeps the four families'
    parameter trees aligned and encoder-wiring changes single-sourced.
    """
    dt = model.dtype
    if model.encoder_type == "histo":
        model.encoder = HistoViT(
            embed_dim=model.embed_dim,
            depth=model.depth,
            num_heads=model.num_heads,
            mlp_ratio=model.mlp_ratio,
            qkv_bias=model.qkv_bias,
            num_classes=model.num_tissue_classes,
            patch_size=model.patch_size,
            extract_layers=model.extract_layers,
            dropout=model.drop_rate,
            attn_dropout=model.attn_drop_rate,
            drop_path_rate=model.drop_path_rate,
            remat=model.remat,
            token_spec=getattr(model, "token_spec", None),
            dtype=dt,
            name="encoder",
        )
    elif model.encoder_type == "sam":
        model.encoder = SamViT(
            embed_dim=model.embed_dim,
            depth=model.depth,
            num_heads=model.num_heads,
            mlp_ratio=model.mlp_ratio,
            qkv_bias=model.qkv_bias,
            out_chans=model.prompt_embed_dim,
            patch_size=model.patch_size,
            window_size=model.window_size,
            global_attn_indexes=model.global_attn_indexes,
            extract_layers=model.extract_layers,
            remat=model.remat,
            dtype=dt,
            name="encoder",
        )
        model.classifier_head = nn.Dense(
            model.num_tissue_classes, dtype=dt, name="classifier_head"
        )
    else:
        raise ValueError(f"unknown encoder_type {model.encoder_type}")


def setup_skip_decoders(model: nn.Module) -> None:
    """Build the four per-resolution skip decoders (`decoder0..3`) shared
    by the separate-tower families (CellViT, CellViTStarDist/CPP)."""
    s11, s12, bott = model.skip_dims
    d, dt = model.drop_rate, model.dtype
    model.decoder0 = [
        ConvBNRelu(32, dropout=d, dtype=dt),
        ConvBNRelu(64, dropout=d, dtype=dt),
    ]
    model.decoder1 = [
        DeconvBlock(s11, dropout=d, dtype=dt),
        DeconvBlock(s12, dropout=d, dtype=dt),
        DeconvBlock(128, dropout=d, dtype=dt),
    ]
    model.decoder2 = [
        DeconvBlock(s11, dropout=d, dtype=dt),
        DeconvBlock(256, dropout=d, dtype=dt),
    ]
    model.decoder3 = [DeconvBlock(bott, dropout=d, dtype=dt)]


class CellViT(nn.Module):
    """CellViT segmentation model (HoVer-Net heads).

    __call__(x NHWC in [0,1]-normalized space) returns a dict:
      tissue_types       (B, num_tissue_classes)  raw logits
      nuclei_binary_map  (B, H, W, 2)             raw logits
      hv_map             (B, H, W, 2)             raw regression output
      nuclei_type_map    (B, H, W, num_nuclei_classes)  raw logits
      [regression_map    (B, H, W, 2)]            if regression_loss
      [tokens            (B, Ht, Wt, E)]          if retrieve_tokens
    """

    num_nuclei_classes: int
    num_tissue_classes: int
    embed_dim: int
    depth: int
    num_heads: int
    extract_layers: Sequence[int]
    encoder_type: str = "histo"  # "histo" (ViT-256/DINO) | "sam" (ViTDet)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    regression_loss: bool = False
    # SAM-only settings
    global_attn_indexes: Sequence[int] = ()
    window_size: int = 14
    prompt_embed_dim: int = 256
    patch_size: int = 16
    remat: bool = False
    # sequence parallelism for the histo encoder: a NamedSharding for the
    # (B, N, C) token activations (parallel.seq_sharding(mesh)); tokens are
    # sharded over the mesh's model axis and GSPMD partitions the attention
    # einsums (see models/vit.py:HistoViT.token_spec)
    token_spec: Optional[Any] = None
    dtype: Dtype = jnp.float32

    @property
    def skip_dims(self) -> Tuple[int, int, int]:
        if self.embed_dim < 512:
            return 256, 128, 312
        return 512, 256, 512

    def setup(self):
        assert len(self.extract_layers) == 4, "need 4 skip connections"
        dt = self.dtype
        setup_vit_encoder(self)
        setup_skip_decoders(self)

        _, _, bott = self.skip_dims
        d = self.drop_rate
        offset = 2 if self.regression_loss else 0
        self.nuclei_binary_map_decoder = UpsamplingBranch(
            2 + offset, bott, dropout=d, dtype=dt
        )
        self.hv_map_decoder = UpsamplingBranch(2, bott, dropout=d, dtype=dt)
        self.nuclei_type_maps_decoder = UpsamplingBranch(
            self.num_nuclei_classes, bott, dropout=d, dtype=dt
        )

    def _tokens_to_grid(self, z: jax.Array, ht: int, wt: int) -> jax.Array:
        """Skip tokens → (B, Ht, Wt, E). HistoViT skips carry a CLS token."""
        if self.encoder_type == "histo":
            z = z[:, 1:, :]
            return z.reshape(z.shape[0], ht, wt, z.shape[-1])
        return z  # SAM skips are already (B, Ht, Wt, E)

    def encode_features(
        self, x: jax.Array, *, train: bool = False
    ) -> Tuple[Dict[str, jax.Array], Tuple[jax.Array, ...], jax.Array]:
        """Encoder + shared skip projections (everything before the three
        branch towers): returns (extra outputs, (p0..p3), z4). Used by the
        fused inference decoder (`models/fused.py`) via
        ``model.apply(variables, x, method="encode_features")``."""
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
        return out, (p0, p1, p2, p3), z4

    def __call__(
        self, x: jax.Array, *, train: bool = False, retrieve_tokens: bool = False
    ) -> Dict[str, jax.Array]:
        out, (p0, p1, p2, p3), z4 = self.encode_features(x, train=train)

        nb = self.nuclei_binary_map_decoder(p0, p1, p2, p3, z4, train=train)
        if self.regression_loss:
            out["nuclei_binary_map"] = nb[..., :2]
            out["regression_map"] = nb[..., 2:]
        else:
            out["nuclei_binary_map"] = nb
        out["hv_map"] = self.hv_map_decoder(p0, p1, p2, p3, z4, train=train)
        out["nuclei_type_map"] = self.nuclei_type_maps_decoder(
            p0, p1, p2, p3, z4, train=train
        )
        if retrieve_tokens:
            out["tokens"] = z4
        return out


def CellViT256(
    num_nuclei_classes: int,
    num_tissue_classes: int,
    drop_rate: float = 0.0,
    attn_drop_rate: float = 0.0,
    drop_path_rate: float = 0.0,
    regression_loss: bool = False,
    remat: bool = False,
    dtype: Dtype = jnp.float32,
) -> CellViT:
    """CellViT preset with the HIPT/DINO ViT-256 backbone (reference
    cellvit.py:428-493): embed 384, depth 12, heads 6, skips at [3,6,9,12]."""
    return CellViT(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        embed_dim=384,
        depth=12,
        num_heads=6,
        extract_layers=(3, 6, 9, 12),
        encoder_type="histo",
        drop_rate=drop_rate,
        attn_drop_rate=attn_drop_rate,
        drop_path_rate=drop_path_rate,
        regression_loss=regression_loss,
        remat=remat,
        dtype=dtype,
    )


SAM_CONFIGS = {
    # reference cellvit.py:646-665
    "SAM-B": dict(
        embed_dim=768, depth=12, num_heads=12,
        global_attn_indexes=(2, 5, 8, 11), extract_layers=(3, 6, 9, 12),
    ),
    "SAM-L": dict(
        embed_dim=1024, depth=24, num_heads=16,
        global_attn_indexes=(5, 11, 17, 23), extract_layers=(6, 12, 18, 24),
    ),
    "SAM-H": dict(
        embed_dim=1280, depth=32, num_heads=16,
        global_attn_indexes=(7, 15, 23, 31), extract_layers=(8, 16, 24, 32),
    ),
}


def CellViTSAM(
    num_nuclei_classes: int,
    num_tissue_classes: int,
    vit_structure: str,
    drop_rate: float = 0.0,
    regression_loss: bool = False,
    remat: bool = False,
    dtype: Dtype = jnp.float32,
) -> CellViT:
    """CellViT preset with a SAM ViTDet backbone (reference
    cellvit.py:496-665). `vit_structure` ∈ {SAM-B, SAM-L, SAM-H}."""
    cfg = SAM_CONFIGS[vit_structure.upper()]
    return CellViT(
        num_nuclei_classes=num_nuclei_classes,
        num_tissue_classes=num_tissue_classes,
        encoder_type="sam",
        drop_rate=drop_rate,
        regression_loss=regression_loss,
        remat=remat,
        dtype=dtype,
        **cfg,
    )
