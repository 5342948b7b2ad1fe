"""Histopathology ViT encoder (HIPT/DINO ViT-256 style), flax.linen, NHWC.

Behavioral parity target: `models/encoders/VIT/vits_histo.py:106-492` in the
reference — a timm-style ViT with a learned 1-D positional embedding + CLS
token, bicubic pos-emb interpolation for arbitrary input sizes, and per-block
skip extraction (`models/segmentation/cell_segmentation/utils.py:89-174`).

TPU-first design choices:
* patch embedding is a space-to-depth reshape + Dense (single MXU matmul);
* pos-emb interpolation is a precomputed dense resize operator (matmul)
  instead of an image-resize op — exact torch `F.interpolate` bicubic
  semantics, computed at trace time from static shapes;
* attention is one fused qkv projection + `jnp.einsum` contractions, bf16
  under `dtype`, f32 softmax.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cellvit_tpu.models.layers import (
    Mlp,
    PatchEmbed,
    drop_path,
    resize_matrix_1d,
    trunc_normal_init,
)

Dtype = Any


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv projection."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    no_flash: bool = False  # force the einsum path (sequence parallelism:
    # GSPMD partitions the einsums over sharded tokens; pallas_call is not
    # auto-partitionable)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = hd**-0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)

        # large token counts (1024² tiles → 4097 tokens): Pallas flash
        # attention avoids materializing the O(N²·heads) logits. Custom VJP
        # (flash backward in Pallas) makes it usable in training too, as
        # long as no attention dropout is requested (the kernel never
        # materializes the probability matrix to drop from).
        use_flash = (
            n >= 1024
            and not self.no_flash
            and (not train or self.attn_dropout == 0.0)
            and jax.default_backend() != "cpu"
        )
        if use_flash:  # Pallas needs TPU; CPU falls through to XLA
            from cellvit_tpu.ops.attention import flash_attention

            out = flash_attention(q, k, v).reshape(b, n, c)
            out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
            if self.dropout > 0.0:
                out = nn.Dropout(self.dropout, deterministic=not train)(out)
            return out

        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        if self.attn_dropout > 0.0:
            attn = nn.Dropout(self.attn_dropout, deterministic=not train)(attn)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn.astype(self.dtype), v,
            preferred_element_type=self.dtype,
        )
        out = out.reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class Block(nn.Module):
    """Pre-LN transformer block: LN→MHA→(+), LN→MLP→(+), with drop-path.

    `train` is positional (not kw-only) so nn.remat can mark it static.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path_rate: float = 0.0
    no_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def dp(y: jax.Array) -> jax.Array:
            rng = self.make_rng("dropout") if (train and self.drop_path_rate > 0) else None
            return drop_path(y, self.drop_path_rate, not train, rng)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(
            self.dim,
            self.num_heads,
            qkv_bias=self.qkv_bias,
            dropout=self.dropout,
            attn_dropout=self.attn_dropout,
            no_flash=self.no_flash,
            dtype=self.dtype,
            name="attn",
        )(y, train=train)
        x = x + dp(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            int(self.dim * self.mlp_ratio),
            self.dim,
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, train=train)
        return x + dp(y)


class HistoViT(nn.Module):
    """DINO/HIPT-style ViT with CLS token and 1-D pos-emb.

    Returns `(cls_logits, cls_token, skips)` where skips are the full token
    sequences after each block index in `extract_layers` (1-based), matching
    `ViTCellViT.forward` (reference utils.py:149-174).
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_classes: int = 0
    patch_size: int = 16
    pretrain_img_size: int = 224
    extract_layers: Sequence[int] = ()
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path_rate: float = 0.0
    remat: bool = False  # rematerialize blocks (trade FLOPs for memory)
    # sequence parallelism: a NamedSharding for the (B, N, C) token
    # activations (e.g. parallel.seq_sharding(mesh) → P("data","model",None)).
    # Constrained after the pos-emb and after every block; XLA GSPMD
    # partitions the attention/MLP einsums over the token axis and inserts
    # the K/V all-gathers. New capability vs the reference (SURVEY §5:
    # "shard the token axis over the mesh — new capability, not a port").
    # Uses the einsum attention path (pallas_call is not GSPMD-partitionable).
    token_spec: Optional[Any] = None
    dtype: Dtype = jnp.float32

    def _constrain(self, tokens: jax.Array) -> jax.Array:
        if self.token_spec is None:
            return tokens
        return jax.lax.with_sharding_constraint(tokens, self.token_spec)

    def setup(self):
        n_pre = (self.pretrain_img_size // self.patch_size) ** 2
        self.cls_token = self.param(
            "cls_token", trunc_normal_init, (1, 1, self.embed_dim), jnp.float32
        )
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_init, (1, n_pre + 1, self.embed_dim), jnp.float32
        )
        self.patch_embed = PatchEmbed(
            self.embed_dim, self.patch_size, dtype=self.dtype, name="patch_embed"
        )
        import numpy as np

        rates = [float(r) for r in np.linspace(0.0, self.drop_path_rate, self.depth)]
        block_cls = nn.remat(Block, static_argnums=(2,)) if self.remat else Block
        self.blocks = [
            block_cls(
                self.embed_dim,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                drop_path_rate=rates[i],
                no_flash=self.token_spec is not None,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=self.dtype, name="head")
        else:
            self.head = None

    def _interpolated_pos_embed(self, ht: int, wt: int) -> jax.Array:
        """Bicubic-resize the (grid) pos-emb to an (ht, wt) token grid.

        Matches `interpolate_pos_encoding` (vits_histo.py:377-402): scale
        factors carry the reference's +0.1 fudge; implemented as two dense
        matmuls built at trace time (shapes are static under jit).
        """
        n_pre = self.pos_embed.shape[1] - 1
        g = int(math.sqrt(n_pre))
        if ht * wt == n_pre and ht == wt:
            return self.pos_embed
        cls_pe = self.pos_embed[:, :1]
        patch_pe = self.pos_embed[:, 1:].reshape(1, g, g, self.embed_dim)
        mh = resize_matrix_1d(g, ht, (ht + 0.1) / g, mode="bicubic")
        mw = resize_matrix_1d(g, wt, (wt + 0.1) / g, mode="bicubic")
        out = jnp.einsum("Hg,bghc,Wh->bHWc", mh, patch_pe, mw)
        out = out.reshape(1, ht * wt, self.embed_dim)
        return jnp.concatenate([cls_pe, out], axis=1)

    def prepare_tokens(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b, h, w, _ = x.shape
        tokens = self.patch_embed(x)  # (B, Ht, Wt, E)
        ht, wt = tokens.shape[1], tokens.shape[2]
        tokens = tokens.reshape(b, ht * wt, self.embed_dim)
        cls = jnp.broadcast_to(
            self.cls_token.astype(tokens.dtype), (b, 1, self.embed_dim)
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        pe = self._interpolated_pos_embed(ht, wt).astype(tokens.dtype)
        tokens = tokens + pe
        if train and self.dropout > 0.0:
            tokens = nn.Dropout(self.dropout, deterministic=False)(tokens)
        return tokens

    def __call__(
        self, x: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
        tokens = self._constrain(self.prepare_tokens(x, train=train))
        skips: List[jax.Array] = []
        extract = set(self.extract_layers)
        for i, blk in enumerate(self.blocks):
            tokens = self._constrain(blk(tokens, train))
            if (i + 1) in extract:
                skips.append(tokens)
        normed = self.norm(tokens)
        cls_token = normed[:, 0]
        logits = self.head(cls_token) if self.head is not None else cls_token
        return logits, cls_token, skips


def vit_tiny(patch_size: int = 16, **kw) -> HistoViT:
    """timm-style preset (reference vits_histo.py:453-462)."""
    return HistoViT(embed_dim=192, depth=12, num_heads=3,
                    patch_size=patch_size, **kw)


def vit_small(patch_size: int = 16, **kw) -> HistoViT:
    """timm-style preset (reference vits_histo.py:465-474) — the HIPT/DINO
    ViT-256 backbone configuration."""
    return HistoViT(embed_dim=384, depth=12, num_heads=6,
                    patch_size=patch_size, **kw)


def vit_base(patch_size: int = 16, **kw) -> HistoViT:
    """timm-style preset (reference vits_histo.py:477-486)."""
    return HistoViT(embed_dim=768, depth=12, num_heads=12,
                    patch_size=patch_size, **kw)


class DINOHead(nn.Module):
    """DINO projection head (reference vits_histo.py:495-540): n-layer GELU
    MLP (optional BN) → bottleneck → weight-normalized linear to out_dim."""

    out_dim: int
    use_bn: bool = False
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        n = max(self.nlayers, 1)
        if n == 1:
            x = nn.Dense(self.bottleneck_dim, dtype=self.dtype)(x)
        else:
            x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype,
                )(x)
            x = jax.nn.gelu(x, approximate=False)
            for _ in range(n - 2):
                x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=self.dtype,
                    )(x)
                x = jax.nn.gelu(x, approximate=False)
            x = nn.Dense(self.bottleneck_dim, dtype=self.dtype)(x)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        x = nn.WeightNorm(
            nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype),
            feature_axes=-1,
        )(x)
        return x


class ViT256Embedder:
    """Standalone HIPT ViT-256 patch embedder (reference
    vits_histo.py:543-643, `ViT256_16`): crops an image to a 256-divisible
    size, unfolds it into 256² sub-patches, and returns the grid of CLS
    embeddings (h_256, w_256, 384) per image. Used to tokenize large WSI
    regions for hierarchical models.
    """

    def __init__(self, checkpoint_path: Optional[str] = None,
                 dtype=jnp.float32):
        from cellvit_tpu.models.checkpoint_io import load_dino_encoder

        self.model = vit_small(num_classes=0, dtype=dtype)
        if checkpoint_path is not None:
            params = load_dino_encoder(checkpoint_path)
            self.variables = {"params": params["params"]}
        else:
            self.variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))
            )
        self._fwd = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False)[1]
        )

    def __call__(self, x) -> jax.Array:
        """x: (B, H, W, 3) → (B, H//256, W//256, 384) CLS-token grid."""
        b, h, w, c = x.shape
        hc, wc = (h // 256) * 256, (w // 256) * 256
        x = x[:, :hc, :wc]
        gh, gw = hc // 256, wc // 256
        tiles = x.reshape(b, gh, 256, gw, 256, c).transpose(0, 1, 3, 2, 4, 5)
        tiles = tiles.reshape(b * gh * gw, 256, 256, c)
        cls = self._fwd(self.variables, jnp.asarray(tiles))
        return cls.reshape(b, gh, gw, cls.shape[-1])
