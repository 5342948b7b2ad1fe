"""StarDist-RN50 baseline: ResNet50 encoder + bilinear U-Net decoders.

Behavioral parity target: `models/segmentation/cell_segmentation/
cpp_net_stardist_rn50.py` (CPP-Net's original baseline): torchvision-style
ResNet50 returning the four stage features (256/512/1024/2048 ch at
strides 4/8/16/32), two bilinear-upsampling U-Net towers — one for
dist/ray heads (shared 256-ch feature conv), one for the type map — and
ReLU-activated ray outputs. NHWC, flax.linen.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BottleneckBlock(nn.Module):
    """ResNet bottleneck: 1×1 → 3×3(stride) → 1×1(×4) with projection."""

    features: int
    stride: int = 1
    project: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        # torch Conv2d(k=3, s, p=1) pads (1,1); flax "SAME" at stride 2
        # pads (0,1) — a half-pixel grid shift on every strided stage
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.project:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Encoder(nn.Module):
    """ResNet50 trunk returning stage features.

    The reference disables the stem maxpool (cpp_net_stardist_rn50.py
    `_forward_impl`: `# x = self.maxpool(x)`), so stages sit at strides
    2/4/8/16 and the decoder's single final ×2 restores full resolution.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        )
        feats = []
        for stage, (features, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for b in range(blocks):
                y = BottleneckBlock(
                    features,
                    stride=stride if b == 0 else 1,
                    project=b == 0,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(y, train=train)
            feats.append(y)
        return tuple(feats)  # 256/4, 512/8, 1024/16, 2048/32


def _align_corners_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """1-D linear-resize operator with torch align_corners=True mapping
    (``src = dst·(n_in−1)/(n_out−1)``). jax.image.resize only implements
    half-pixel (align_corners=False) sampling, which shifts every sample
    by up to half a source pixel — built at trace time, applied as a
    matmul (same pattern as the pos-emb interpolation in vit.py)."""
    import numpy as np

    mat = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        mat[:, 0] = 1.0
        return jnp.asarray(mat)
    for i in range(n_out):
        src = i * (n_in - 1) / (n_out - 1)
        base = int(np.floor(src))
        frac = src - base
        mat[i, base] += 1.0 - frac
        mat[i, min(base + 1, n_in - 1)] += frac
    return jnp.asarray(mat)


def _up2_taps(n_in: int):
    """Trace-time 2-tap stencil for ×2 align_corners=True linear resize:
    output row i reads inputs floor(src)/floor(src)+1 at
    ``src = i·(n−1)/(2n−1)``. The weights vary per row (align-corners
    mapping), but every row is a 2-tap blend — O(n) gathers instead of the
    former dense (2n,n) matmul (~1 TFLOP per einsum at 1024² tiles)."""
    import numpy as np

    if n_in == 1:
        base = np.zeros(2, np.int32)
        return base, base, np.zeros(2, np.float32)
    i = np.arange(2 * n_in)
    src = i * (n_in - 1) / (2 * n_in - 1)
    base = np.floor(src).astype(np.int32)
    frac = (src - base).astype(np.float32)
    nxt = np.minimum(base + 1, n_in - 1).astype(np.int32)
    return base, nxt, frac


def _bilinear_up2(x: jnp.ndarray) -> jnp.ndarray:
    """2× bilinear upsample, align_corners=True (torch nn.Upsample,
    reference cpp_net_stardist_rn50.py:68/94/623/633). fp32 blend for
    parity with the previous fp32-accumulating einsum."""
    b, h, w, c = x.shape
    bh, nh, fh = _up2_taps(h)
    bw, nw, fw = _up2_taps(w)
    y = x.astype(jnp.float32)
    fh_col = jnp.asarray(fh)[None, :, None, None]
    y = jnp.take(y, bh, axis=1) * (1.0 - fh_col) + jnp.take(y, nh, axis=1) * fh_col
    fw_row = jnp.asarray(fw)[None, None, :, None]
    y = jnp.take(y, bw, axis=2) * (1.0 - fw_row) + jnp.take(y, nw, axis=2) * fw_row
    return y.astype(x.dtype)


class UpBlock(nn.Module):
    """Bilinear up ×2 + concat skip + double conv (reference `up`:
    (Conv → GroupNorm(C/8 groups) → ELU) × 2, cpp_net_stardist_rn50.py:22-39
    — GroupNorm/ELU, not the BatchNorm/ReLU of the CellViT decoders)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        y = _bilinear_up2(x)
        # pad to the skip's spatial size (reference F.pad alignment)
        dh = skip.shape[1] - y.shape[1]
        dw = skip.shape[2] - y.shape[2]
        if dh or dw:
            y = jnp.pad(
                y,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
        y = jnp.concatenate([skip, y], axis=-1)
        for i in range(2):
            y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i + 1}")(y)
            y = nn.GroupNorm(
                num_groups=self.features // 8, epsilon=1e-5,
                dtype=self.dtype, name=f"gn{i + 1}",
            )(y)
            y = nn.elu(y)
        return y


class StarDistRN50(nn.Module):
    """ResNet50 StarDist baseline (reference StarDistRN50:615-728)."""

    n_rays: int = 32
    n_seg_cls: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False, retrieve_tokens: bool = False
    ) -> Dict[str, jax.Array]:
        x1, x2, x3, x4 = ResNet50Encoder(dtype=self.dtype, name="encoder")(
            x, train=train
        )
        y = UpBlock(1024, dtype=self.dtype, name="up1")(x4, x3, train=train)
        y = UpBlock(512, dtype=self.dtype, name="up2")(y, x2, train=train)
        y = UpBlock(256, dtype=self.dtype, name="up3")(y, x1, train=train)
        y = _bilinear_up2(y)  # /2 → /1
        feats = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                        name="features")(y)
        out: Dict[str, jax.Array] = {}
        out["dist_map"] = nn.Conv(1, (1, 1), dtype=self.dtype, name="out_prob")(feats)
        out["stardist_map"] = nn.relu(
            nn.Conv(self.n_rays, (1, 1), dtype=self.dtype, name="out_ray")(feats)
        )

        s = UpBlock(1024, dtype=self.dtype, name="up1_seg")(x4, x3, train=train)
        s = UpBlock(512, dtype=self.dtype, name="up2_seg")(s, x2, train=train)
        s = UpBlock(256, dtype=self.dtype, name="up3_seg")(s, x1, train=train)
        s = _bilinear_up2(s)
        out["nuclei_type_map"] = nn.Conv(
            self.n_seg_cls, (1, 1), dtype=self.dtype, name="out_seg"
        )(s)
        # RN50 baseline has no tissue classifier; emit zeros for API parity
        out["tissue_types"] = jnp.zeros((x.shape[0], 1), self.dtype)
        return out
