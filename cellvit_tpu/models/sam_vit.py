"""SAM ViTDet image encoder (flax.linen, NHWC): windowed attention +
decomposed relative position bias + conv neck.

Behavioral parity target: `models/encoders/VIT/SAM/image_encoder.py:24-426`
and the wrapper `models/segmentation/cell_segmentation/utils.py:177-233` in
the reference. Windowed attention (window 14) with a few global-attention
blocks bounds cost at 4096 tokens for 1024² tiles; skips are extracted after
the blocks listed in `extract_layers` (1-based) and stay in (B, H, W, C).

TPU-first notes:
* tokens remain on a 2-D grid (B, Ht, Wt, C); window partition is pure
  reshape/transpose;
* rel-pos interpolation (127→31 when running 256² training crops through
  global blocks trained at 64×64) is a precomputed linear-resize matmul;
* qkv is one fused projection; softmax in f32, matmuls in `dtype`.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cellvit_tpu.models.layers import (
    LayerNorm2d,
    Mlp,
    PatchEmbed,
    resize_matrix_1d,
    trunc_normal_init,
)

Dtype = Any


def window_partition(x: jax.Array, window: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B, H, W, C) → (B·nW, window, window, C), zero-padding H/W up to a
    multiple of `window`. Returns padded (Hp, Wp)."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jax.Array, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jax.Array:
    """Inverse of `window_partition`, cropping the padding."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def gather_rel_pos(rel_pos: jax.Array, size: int) -> jax.Array:
    """Build the (size, size, head_dim) table R[i, j] = rel_pos[i - j + size-1],
    linearly interpolating the stored table to length 2·size-1 if needed
    (reference `get_rel_pos`, image_encoder.py:321-351; q_size == k_size here).
    """
    need = 2 * size - 1
    if rel_pos.shape[0] != need:
        m = resize_matrix_1d(rel_pos.shape[0], need, need / rel_pos.shape[0], "linear")
        rel_pos = m @ rel_pos
    idx = (
        jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + (size - 1)
    )  # (size, size)
    return rel_pos[idx]


class _DenseParams(nn.Module):
    """The parameter tree of an `nn.Dense` (kernel/bias, same names and
    initializers) WITHOUT applying it — the fused window kernel consumes
    the raw qkv weights, so torch checkpoints keep mapping to
    `attn/qkv/{kernel,bias}` unchanged (`models/checkpoint_io.py:109`)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class SamAttention(nn.Module):
    """MHA over a (B, H, W, C) token grid with decomposed rel-pos bias."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    use_rel_pos: bool = True
    rel_pos_dim: int = 14  # grid side the rel-pos table was sized for
    dtype: Dtype = jnp.float32
    # None = auto: TPU + square grid of 196..256 tokens (the 14×14 windows
    # at every inference size; 16×16 global grids at 256² training crops)
    fused_window: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5
        w_qkv, b_qkv = _DenseParams(
            3 * c, use_bias=self.qkv_bias, name="qkv"
        )(c)

        # fused per-window qkv+attention kernel: the projection, rel-pos
        # bias and softmax·V run inside one Pallas program per window —
        # q/k/v, the head-major transpose, the bias tensors and the logits
        # never exist in HBM (ops/attention.py:window_qkv_attention; the
        # separate-ops path below paid ~4 ms/block of pure relayout copies
        # at SAM-H, round-4 HLO profile)
        use_fused = self.fused_window
        if use_fused is None:
            use_fused = (
                self.use_rel_pos
                and h == w
                and 196 <= h * w <= 256
                and jax.default_backend() != "cpu"
            )
        if use_fused:
            from cellvit_tpu.ops.attention import window_qkv_attention

            n_table = 2 * self.rel_pos_dim - 1
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (n_table, hd), jnp.float32
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (n_table, hd), jnp.float32
            )
            rh = gather_rel_pos(rel_pos_h, h)
            rw = gather_rel_pos(rel_pos_w, w)
            out = window_qkv_attention(
                x.reshape(b, h * w, c).astype(self.dtype),
                w_qkv, b_qkv, rh, rw, nh,
            )
            out = nn.Dense(c, dtype=self.dtype, name="proj")(
                out.reshape(b * h * w, c)
            )
            return out.reshape(b, h, w, c)

        # project on the 2-D flattened tokens: on the 3/4-D windowed shape
        # (200 windows × 196 tokens at 1024²) XLA picks a batch-in-lanes
        # matmul emitter whose {0,4,3,2,1} output layout costs ~4 ms/block
        # of downstream relayout copies (round-4 HLO profile); the 2-D form
        # runs the same dot at 173 TF/s with a plain row-major output.
        # Same math as nn.Dense(dtype): operands cast to the compute dtype.
        qkv = jnp.dot(
            x.reshape(b * h * w, c).astype(self.dtype),
            w_qkv.astype(self.dtype),
        )
        if b_qkv is not None:
            qkv = qkv + b_qkv.astype(self.dtype)
        qkv = qkv.reshape(b, h * w, 3, nh, hd)

        # flash kernel with the decomposed rel-pos bias folded in — both the
        # global grids (1024² tiles → 64×64 tokens) AND the 14×14 windows
        # (windows act as the batch dim). The windowed einsum path measured
        # 6.7 ms/block of logits-materialization HBM traffic at 8×1024²
        # SAM-B (softmax over a 492 MB fp32 buffer: +5.2 ms, logits write:
        # +1.5 ms — round-3 prefix probe); the flash route keeps logits in
        # VMEM. Tiny grids (≤ 4×4 tokens in 64² parity tests) stay on the
        # einsum path, as does CPU (the Mosaic kernel is TPU-only).
        if (
            self.use_rel_pos and h * w >= 196
            and jax.default_backend() != "cpu"
        ):
            from cellvit_tpu.ops.attention import flash_attention_relpos

            # ONE packed head-major transpose of qkv (3, B, H, N, D) whose
            # slices are free views, instead of three per-tensor relayouts
            # inside the kernel staging (round-4 HLO profile: the q/k/v
            # prep copies were ~4 ms of a 19 ms SAM-H windowed block)
            qkv_hm = qkv.transpose(2, 0, 3, 1, 4)
            q, k, v = qkv_hm[0], qkv_hm[1], qkv_hm[2]  # (B, nh, N, hd)
            n_table = 2 * self.rel_pos_dim - 1
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (n_table, hd), jnp.float32
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (n_table, hd), jnp.float32
            )
            rh = gather_rel_pos(rel_pos_h, h)
            rw = gather_rel_pos(rel_pos_w, w)
            out = flash_attention_relpos(q, k, v, rh, rw, grid_hw=(h, w),
                                         layout="bhnd")
            out = nn.Dense(c, dtype=self.dtype, name="proj")(
                out.reshape(b * h * w, c)
            )
            return out.reshape(b, h, w, c)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, nh, hd)

        if self.use_rel_pos:
            n_table = 2 * self.rel_pos_dim - 1
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (n_table, hd), jnp.float32
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (n_table, hd), jnp.float32
            )
            rh = gather_rel_pos(rel_pos_h, h).astype(jnp.float32)  # (h, h, hd)
            rw = gather_rel_pos(rel_pos_w, w).astype(jnp.float32)  # (w, w, hd)
            rq = q.reshape(b, h, w, nh, hd).astype(jnp.float32)
            # bias[b,n,(i,j),(k,l)] = q·Rh[i,k] + q·Rw[j,l]  (mvitv2
            # decomposition) — folded into the q·kᵀ matmul by augmenting
            # q with [q·scale | Bh(q,·) | Bw(q,·)] against
            # k' = [k | 1{ki=·} | 1{kj=·}], so the N² bias tensor is never
            # materialized (it cost 9.9 ms/block of the 22.7 ms windowed
            # SAM block at 8×1024² — see flash_attention_relpos for the
            # same trick on the global path)
            bias_h = jnp.einsum("bijnd,ikd->bijnk", rq, rh)  # (B, h, w, nh, h)
            bias_w = jnp.einsum("bijnd,jld->bijnl", rq, rw)  # (B, h, w, nh, w)
            n = h * w
            ii = jnp.arange(n, dtype=jnp.int32) // w
            jj = jnp.arange(n, dtype=jnp.int32) % w
            onehot = jnp.concatenate(
                [jax.nn.one_hot(ii, h, dtype=k.dtype),
                 jax.nn.one_hot(jj, w, dtype=k.dtype)], axis=-1
            )  # (N, h+w)
            q_aug = jnp.concatenate(
                [q * scale,
                 bias_h.reshape(b, n, nh, h).astype(q.dtype),
                 bias_w.reshape(b, n, nh, w).astype(q.dtype)], axis=-1
            )
            k_aug = jnp.concatenate(
                [k, jnp.broadcast_to(onehot[None, :, None, :], (b, n, nh, h + w))],
                axis=-1,
            )
            attn = jnp.einsum(
                "bqhd,bkhd->bhqk", q_aug, k_aug,
                preferred_element_type=jnp.float32,
            )  # (B, nh, N, N) — logits·scale + bias, computed on the MXU
        else:
            attn = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale  # (B, nh, N, N)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn.astype(self.dtype), v,
            preferred_element_type=self.dtype,
        )
        out = out.reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SamBlock(nn.Module):
    """ViTDet block: LN→(windowed) attention→(+), LN→MLP→(+)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = True
    window_size: int = 0  # 0 = global attention
    grid_size: int = 64  # token-grid side at pretrain resolution (img/16)
    dtype: Dtype = jnp.float32
    fused_window: Optional[bool] = None  # see SamAttention

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = window_partition(y, self.window_size)
        y = SamAttention(
            self.dim,
            self.num_heads,
            qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos,
            rel_pos_dim=self.window_size if self.window_size > 0 else self.grid_size,
            dtype=self.dtype,
            fused_window=self.fused_window,
            name="attn",
        )(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, (h, w))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(y)
        return x + y


class SamViT(nn.Module):
    """SAM image encoder returning (neck-mean feature, neck map, skips).

    Matches `ViTCellViTDeit.forward` (reference utils.py:218-233): skips are
    raw block outputs in (B, Ht, Wt, C); the neck (1×1 conv → LN2d → 3×3 conv
    → LN2d, 256 ch) feeds a spatial-mean classifier feature.
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    out_chans: int = 256
    patch_size: int = 16
    pretrain_img_size: int = 1024
    window_size: int = 14
    global_attn_indexes: Sequence[int] = ()
    extract_layers: Sequence[int] = ()
    use_rel_pos: bool = True
    remat: bool = False  # rematerialize blocks (trade FLOPs for memory)
    dtype: Dtype = jnp.float32
    fused_window: Optional[bool] = None  # see SamAttention

    @nn.compact
    def __call__(
        self, x: jax.Array
    ) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
        grid = self.pretrain_img_size // self.patch_size
        tokens = PatchEmbed(
            self.embed_dim, self.patch_size, dtype=self.dtype, name="patch_embed"
        )(x)
        ht, wt = tokens.shape[1], tokens.shape[2]
        pos_embed = self.param(
            "pos_embed", trunc_normal_init, (1, grid, grid, self.embed_dim), jnp.float32
        )
        tokens = tokens + pos_embed[:, :ht, :wt, :].astype(tokens.dtype)

        skips: List[jax.Array] = []
        extract = set(self.extract_layers)
        block_cls = nn.remat(SamBlock) if self.remat else SamBlock
        for i in range(self.depth):
            tokens = block_cls(
                self.embed_dim,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_rel_pos=self.use_rel_pos,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                grid_size=grid,
                dtype=self.dtype,
                fused_window=self.fused_window,
                name=f"blocks_{i}",
            )(tokens)
            if (i + 1) in extract:
                skips.append(tokens)

        y = nn.Conv(
            self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1"
        )(tokens)
        y = LayerNorm2d(dtype=self.dtype, name="neck_ln1")(y)
        y = nn.Conv(
            self.out_chans,
            (3, 3),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="neck_conv2",
        )(y)
        y = LayerNorm2d(dtype=self.dtype, name="neck_ln2")(y)
        pooled = jnp.mean(y, axis=(1, 2))
        return pooled, y, skips
