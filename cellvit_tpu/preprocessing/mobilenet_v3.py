"""MobileNetV3-Small (flax) + torchvision checkpoint converter.

The reference's post-extraction tissue filter is a torchvision
`mobilenet_v3_small` with its last classifier layer swapped for
`Linear(1024, 4)` and weights shipped as `tissue_detector.pt`
(`preprocessing/patch_extraction/src/patch_extraction.py:260-305`). This
module reimplements the architecture in flax (NHWC) and maps the
torchvision state dict 1:1 so that shipped checkpoint loads unchanged.

Numerical-parity notes (all matter for logit equality):
* BatchNorm eps 1e-3 (torchvision mobilenet default), not flax's 1e-5.
* Hardswish/Hardsigmoid are the exact piecewise forms x·relu6(x+3)/6.
* stride-2 convs use torch's symmetric padding (k-1)//2, NOT "SAME"
  (these differ for even spatial sizes).
* Squeeze-Excitation bottleneck widths follow torchvision's
  `_make_divisible(expand // 4, 8)`.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# (kernel, expanded, out, use_se, use_hs, stride) per inverted residual —
# torchvision mobilenet_v3_small's bneck table
MNV3_SMALL_CONFIG: Tuple[Tuple[int, int, int, bool, bool, int], ...] = (
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardswish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hardsigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _torch_pad(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p = (k - 1) // 2
    return ((p, p), (p, p))


class ConvBNAct(nn.Module):
    """torchvision Conv2dNormActivation: conv(no bias) → BN(eps 1e-3) → act."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_hs: bool = False
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=_torch_pad(self.kernel),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="bn",
        )(x)
        if self.act:
            x = hardswish(x) if self.use_hs else nn.relu(x)
        return x


class SqueezeExcitation(nn.Module):
    """torchvision SE: GAP → 1×1 conv → ReLU → 1×1 conv → Hardsigmoid."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = _make_divisible(self.channels // 4, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * hardsigmoid(s)


class InvertedResidual(nn.Module):
    kernel: int
    expanded: int
    out: int
    use_se: bool
    use_hs: bool
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        y = x
        idx = 0
        if self.expanded != in_ch:
            y = ConvBNAct(
                self.expanded, kernel=1, use_hs=self.use_hs, dtype=self.dtype,
                name=f"layer{idx}",
            )(y, train=train)
            idx += 1
        y = ConvBNAct(
            self.expanded, kernel=self.kernel, stride=self.stride,
            groups=self.expanded, use_hs=self.use_hs, dtype=self.dtype,
            name=f"layer{idx}",
        )(y, train=train)
        idx += 1
        if self.use_se:
            y = SqueezeExcitation(self.expanded, dtype=self.dtype, name=f"layer{idx}")(y)
            idx += 1
        y = ConvBNAct(
            self.out, kernel=1, act=False, dtype=self.dtype, name=f"layer{idx}"
        )(y, train=train)
        if self.stride == 1 and in_ch == self.out:
            y = y + x
        return y


class MobileNetV3Small(nn.Module):
    """torchvision `mobilenet_v3_small` with a `num_classes` head.

    Input NHWC in ImageNet-normalized space; the reference feeds 224²
    (Resize(224) + Normalize(imagenet), patch_extraction.py:295-305).
    """

    num_classes: int = 4
    dropout: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = ConvBNAct(16, kernel=3, stride=2, use_hs=True, dtype=self.dtype,
                      name="stem")(x, train=train)
        for i, (k, exp, out, se, hs, s) in enumerate(MNV3_SMALL_CONFIG):
            x = InvertedResidual(
                kernel=k, expanded=exp, out=out, use_se=se, use_hs=hs,
                stride=s, dtype=self.dtype, name=f"block{i}",
            )(x, train=train)
        x = ConvBNAct(576, kernel=1, use_hs=True, dtype=self.dtype, name="head_conv")(
            x, train=train
        )
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(1024, dtype=self.dtype, name="fc1")(x)
        x = hardswish(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


# --------------------------------------------------------------------- io


def _conv_w(w: np.ndarray, depthwise: bool = False) -> np.ndarray:
    # torch (O, I/g, kh, kw) → flax (kh, kw, I/g, O)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def convert_mobilenet_state_dict(sd: Dict[str, Any]) -> Dict[str, Dict]:
    """torchvision mobilenet_v3_small state dict → flax variables.

    Handles the reference checkpoint layout (`tissue_detector.pt`'s
    `model_state_dict`) including the swapped 4-class head.
    """
    params: Dict = {}
    stats: Dict = {}

    def to_np(v):
        return np.asarray(v.numpy() if hasattr(v, "numpy") else v, np.float32)

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def map_cba(prefix: str, dst: Tuple[str, ...]) -> None:
        put(params, dst + ("conv", "kernel"), _conv_w(to_np(sd[prefix + ".0.weight"])))
        put(params, dst + ("bn", "scale"), to_np(sd[prefix + ".1.weight"]))
        put(params, dst + ("bn", "bias"), to_np(sd[prefix + ".1.bias"]))
        put(stats, dst + ("bn", "mean"), to_np(sd[prefix + ".1.running_mean"]))
        put(stats, dst + ("bn", "var"), to_np(sd[prefix + ".1.running_var"]))

    map_cba("features.0", ("stem",))
    for i, (k, exp, out, se, hs, s) in enumerate(MNV3_SMALL_CONFIG):
        tsrc = f"features.{i + 1}.block"
        dst = f"block{i}"
        j = 0  # torch Sequential index
        li = 0  # our layer index
        in_ch = 16 if i == 0 else MNV3_SMALL_CONFIG[i - 1][2]
        if exp != in_ch:
            map_cba(f"{tsrc}.{j}", (dst, f"layer{li}"))
            j += 1
            li += 1
        map_cba(f"{tsrc}.{j}", (dst, f"layer{li}"))  # depthwise
        j += 1
        li += 1
        if se:
            for fc in ("fc1", "fc2"):
                put(
                    params,
                    (dst, f"layer{li}", fc, "kernel"),
                    _conv_w(to_np(sd[f"{tsrc}.{j}.{fc}.weight"])),
                )
                put(
                    params,
                    (dst, f"layer{li}", fc, "bias"),
                    to_np(sd[f"{tsrc}.{j}.{fc}.bias"]),
                )
            j += 1
            li += 1
        map_cba(f"{tsrc}.{j}", (dst, f"layer{li}"))  # project
    map_cba("features.12", ("head_conv",))

    put(params, ("fc1", "kernel"), to_np(sd["classifier.0.weight"]).T)
    put(params, ("fc1", "bias"), to_np(sd["classifier.0.bias"]))
    put(params, ("fc2", "kernel"), to_np(sd["classifier.3.weight"]).T)
    put(params, ("fc2", "bias"), to_np(sd["classifier.3.bias"]))
    return {"params": params, "batch_stats": stats}


def load_torch_tissue_detector(path) -> Tuple[MobileNetV3Small, Dict[str, Dict]]:
    """Load the reference's shipped tissue-detector checkpoint
    (`tissue_detector.pt`: {"model_state_dict": ...}) into the flax model."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    n_classes = int(np.asarray(sd["classifier.3.weight"].shape)[0])
    model = MobileNetV3Small(num_classes=n_classes)
    return model, convert_mobilenet_state_dict(sd)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_patch(img: np.ndarray, size: int = 224) -> np.ndarray:
    """Reference detector transforms (patch_extraction.py:295-305):
    Resize(224) (PIL bilinear, antialiased) + ImageNet normalize.
    `img` is HWC float [0, 1]."""
    from PIL import Image

    arr = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    h, w = img.shape[:2]
    if h <= w:
        new = (size, int(round(w * size / h)))
    else:
        new = (int(round(h * size / w)), size)
    arr = arr.resize((new[1], new[0]), Image.BILINEAR)
    out = np.asarray(arr, np.float32) / 255.0
    return (out - IMAGENET_MEAN) / IMAGENET_STD
