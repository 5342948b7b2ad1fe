"""Augmentation pipeline (numpy/cv2, host-side).

Framework-owned equivalents of the albumentations transforms the reference
configures in `experiment_cellvit_pannuke.py:648-780` (RandomRotate90,
H/V flip, Downscale, Blur, GaussNoise, ColorJitter, Superpixels, ZoomBlur,
RandomSizedCrop, ElasticTransform, Normalize). Each transform is a callable
`(img uint8 HWC, mask int HW C) -> (img, mask)` drawing randomness from a
shared generator; geometric ops move image and mask together (mask uses
nearest interpolation), photometric ops touch only the image.

`build_transforms(transform_settings, input_shape)` mirrors the reference's
config keys and defaults and returns (train_pipeline, val_pipeline).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

Sample = Tuple[np.ndarray, np.ndarray]


class Compose:
    """Transform pipeline with per-thread generators.

    The DataLoader calls `__call__` from multiple worker threads; numpy
    Generators are not thread-safe (concurrent draws can corrupt the
    bit-generator state), so each thread gets its own Generator spawned
    deterministically from the seed's SeedSequence. Exact cross-run
    reproducibility of augmentation draws additionally requires a
    single-threaded loader (thread→sample assignment is scheduling-
    dependent either way)."""

    def __init__(self, transforms: List, seed: Optional[int] = None) -> None:
        self.transforms = transforms
        self.reseed(seed)

    def reseed(self, seed: Optional[int]) -> None:
        import threading

        self._seed_seq = np.random.SeedSequence(seed)
        self._local = threading.local()
        self._lock = threading.Lock()

    @property
    def rng(self) -> np.random.Generator:
        rng = getattr(self._local, "rng", None)
        if rng is None:
            with self._lock:
                rng = np.random.default_rng(self._seed_seq.spawn(1)[0])
            self._local.rng = rng
        return rng

    def __call__(self, img: np.ndarray, mask: np.ndarray) -> Sample:
        rng = self.rng
        for t in self.transforms:
            img, mask = t(img, mask, rng)
        return img, mask


class _P:
    """Apply the wrapped op with probability p."""

    def __init__(self, p: float) -> None:
        self.p = p

    def __call__(self, img, mask, rng):
        if rng.random() < self.p:
            return self.apply(img, mask, rng)
        return img, mask

    def apply(self, img, mask, rng) -> Sample:  # pragma: no cover - abstract
        raise NotImplementedError


class RandomRotate90(_P):
    def apply(self, img, mask, rng):
        k = int(rng.integers(0, 4))
        return np.rot90(img, k).copy(), np.rot90(mask, k).copy()


class HorizontalFlip(_P):
    def apply(self, img, mask, rng):
        return img[:, ::-1].copy(), mask[:, ::-1].copy()


class VerticalFlip(_P):
    def apply(self, img, mask, rng):
        return img[::-1].copy(), mask[::-1].copy()


class Downscale(_P):
    def __init__(self, p: float, scale: float) -> None:
        super().__init__(p)
        self.scale = scale

    def apply(self, img, mask, rng):
        h, w = img.shape[:2]
        small = cv2.resize(
            img, (int(w * self.scale), int(h * self.scale)),
            interpolation=cv2.INTER_NEAREST,
        )
        return (
            cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST),
            mask,
        )


class Blur(_P):
    def __init__(self, p: float, blur_limit: int = 7) -> None:
        super().__init__(p)
        self.blur_limit = blur_limit

    def apply(self, img, mask, rng):
        k = int(rng.integers(1, self.blur_limit // 2 + 1)) * 2 + 1
        return cv2.blur(img, (k, k)), mask


class GaussNoise(_P):
    def __init__(self, p: float, var_limit=(10.0, 50.0)) -> None:
        super().__init__(p)
        if np.isscalar(var_limit):
            var_limit = (0.0, float(var_limit))
        self.var_limit = var_limit

    def apply(self, img, mask, rng):
        var = rng.uniform(*self.var_limit)
        noise = rng.normal(0.0, var**0.5, img.shape)
        out = np.clip(img.astype(np.float32) + noise, 0, 255).astype(img.dtype)
        return out, mask


class ColorJitter(_P):
    """torchvision-style jitter: random brightness/contrast/saturation/hue
    factors applied in random order."""

    def __init__(
        self, p: float, brightness=0.5, contrast=0.5, saturation=0.1, hue=0.05
    ) -> None:
        super().__init__(p)
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def apply(self, img, mask, rng):
        x = img.astype(np.float32)
        ops = list(range(4))
        rng.shuffle(ops)
        for op in ops:
            if op == 0 and self.brightness:
                f = rng.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
                x = x * f
            elif op == 1 and self.contrast:
                f = rng.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
                mean = cv2.cvtColor(
                    np.clip(x, 0, 255).astype(np.uint8), cv2.COLOR_RGB2GRAY
                ).mean()
                x = (x - mean) * f + mean
            elif op == 2 and self.saturation:
                f = rng.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
                gray = cv2.cvtColor(
                    np.clip(x, 0, 255).astype(np.uint8), cv2.COLOR_RGB2GRAY
                ).astype(np.float32)[..., None]
                x = (x - gray) * f + gray
            elif op == 3 and self.hue:
                f = rng.uniform(-self.hue, self.hue)
                hsv = cv2.cvtColor(
                    np.clip(x, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
                ).astype(np.float32)
                hsv[..., 0] = (hsv[..., 0] + f * 180.0) % 180.0
                x = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
                    np.float32
                )
        return np.clip(x, 0, 255).astype(img.dtype), mask


class Superpixels(_P):
    """Replace a random subset of SLIC-like segments by their mean color
    (albumentations Superpixels with p_replace)."""

    def __init__(
        self, p: float, p_replace: float = 0.1, n_segments: int = 200,
        max_size: Optional[int] = None,
    ) -> None:
        super().__init__(p)
        self.p_replace = p_replace
        self.n_segments = n_segments
        self.max_size = max_size

    def _grid_segments(self, h: int, w: int) -> np.ndarray:
        side = max(1, int(np.sqrt(self.n_segments)))
        gy = np.minimum((np.arange(h) * side) // h, side - 1)
        gx = np.minimum((np.arange(w) * side) // w, side - 1)
        return gy[:, None] * side + gx[None, :]

    def apply(self, img, mask, rng):
        h, w = img.shape[:2]
        seg = self._grid_segments(h, w)
        n = seg.max() + 1
        replace = rng.random(n) < self.p_replace
        if not replace.any():
            return img, mask
        out = img.copy()
        flat = seg.reshape(-1)
        for c in range(img.shape[2]):
            sums = np.bincount(flat, img[..., c].reshape(-1).astype(np.float64), n)
            counts = np.bincount(flat, minlength=n)
            means = (sums / np.maximum(counts, 1)).astype(img.dtype)
            ch = out[..., c]
            sel = replace[seg]
            ch[sel] = means[seg][sel]
        return out, mask


class ZoomBlur(_P):
    def __init__(self, p: float, max_factor: float = 1.05) -> None:
        super().__init__(p)
        self.max_factor = max_factor

    def apply(self, img, mask, rng):
        h, w = img.shape[:2]
        factors = np.linspace(1.0, rng.uniform(1.0, self.max_factor), 6)
        acc = np.zeros(img.shape, np.float32)
        for f in factors:
            nh, nw = int(h * f), int(w * f)
            zoomed = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            y0, x0 = (nh - h) // 2, (nw - w) // 2
            acc += zoomed[y0 : y0 + h, x0 : x0 + w].astype(np.float32)
        out = np.clip(acc / len(factors), 0, 255).astype(img.dtype)
        return out, mask


class RandomSizedCrop(_P):
    def __init__(self, p: float, min_max_height: Tuple[int, int], height: int, width: int):
        super().__init__(p)
        self.min_max_height = (int(min_max_height[0]), int(min_max_height[1]))
        self.height = height
        self.width = width

    def apply(self, img, mask, rng):
        h, w = img.shape[:2]
        ch = int(rng.integers(self.min_max_height[0], self.min_max_height[1] + 1))
        ch = min(ch, h, w)
        y0 = int(rng.integers(0, h - ch + 1))
        x0 = int(rng.integers(0, w - ch + 1))
        img_c = img[y0 : y0 + ch, x0 : x0 + ch]
        mask_c = mask[y0 : y0 + ch, x0 : x0 + ch]
        img_r = cv2.resize(img_c, (self.width, self.height), interpolation=cv2.INTER_LINEAR)
        mask_r = cv2.resize(
            mask_c.astype(np.int32), (self.width, self.height),
            interpolation=cv2.INTER_NEAREST,
        )
        if mask_r.ndim == 2 and mask.ndim == 3:
            mask_r = mask_r[..., None]
        return img_r, mask_r


class ElasticTransform(_P):
    """Gaussian-smoothed random displacement + random affine
    (albumentations ElasticTransform semantics with sigma/alpha/alpha_affine)."""

    def __init__(
        self, p: float, alpha: float = 0.5, sigma: float = 25.0,
        alpha_affine: float = 15.0,
    ) -> None:
        super().__init__(p)
        self.alpha = alpha
        self.sigma = sigma
        self.alpha_affine = alpha_affine

    def apply(self, img, mask, rng):
        h, w = img.shape[:2]
        center = np.float32([w, h]) / 2
        sq = min(h, w) // 3
        pts1 = np.float32(
            [center + sq, [center[0] + sq, center[1] - sq], center - sq]
        )
        pts2 = pts1 + rng.uniform(
            -self.alpha_affine, self.alpha_affine, pts1.shape
        ).astype(np.float32)
        m = cv2.getAffineTransform(pts1, pts2)

        dx = cv2.GaussianBlur(
            rng.uniform(-1, 1, (h, w)).astype(np.float32), (17, 17), self.sigma
        ) * self.alpha
        dy = cv2.GaussianBlur(
            rng.uniform(-1, 1, (h, w)).astype(np.float32), (17, 17), self.sigma
        ) * self.alpha
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        map_x = (xx + dx).astype(np.float32)
        map_y = (yy + dy).astype(np.float32)

        img_o = cv2.warpAffine(img, m, (w, h), borderMode=cv2.BORDER_REFLECT_101)
        img_o = cv2.remap(
            img_o, map_x, map_y, interpolation=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_REFLECT_101,
        )
        mask_o = cv2.warpAffine(
            mask.astype(np.int32), m, (w, h), flags=cv2.INTER_NEAREST,
            borderMode=cv2.BORDER_REFLECT_101,
        )
        mask_o = cv2.remap(
            mask_o, map_x, map_y, interpolation=cv2.INTER_NEAREST,
            borderMode=cv2.BORDER_REFLECT_101,
        )
        if mask_o.ndim == 2 and mask.ndim == 3:
            mask_o = mask_o[..., None]
        return img_o, mask_o


class Normalize:
    """(img/255 - mean)/std — albumentations A.Normalize semantics."""

    def __init__(self, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)) -> None:
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, mask, rng=None):
        img = img.astype(np.float32) / 255.0
        return (img - self.mean) / self.std, mask


def build_transforms(
    transform_settings: Dict, input_shape: int = 256, seed: Optional[int] = None
) -> Tuple[Compose, Compose]:
    """Config → (train, val) pipelines, mirroring the reference's keys and
    parameter plumbing (experiment_cellvit_pannuke.py:648-780)."""
    ts = {k.lower(): v for k, v in (transform_settings or {}).items()}
    tl: List = []

    def p_of(key: str) -> float:
        p = ts[key].get("p", 0) if isinstance(ts.get(key), dict) else 0
        return p if (p and 0 < p <= 1) else 0

    if p_of("randomrotate90"):
        tl.append(RandomRotate90(p_of("randomrotate90")))
    if p_of("horizontalflip"):
        tl.append(HorizontalFlip(p_of("horizontalflip")))
    if p_of("verticalflip"):
        tl.append(VerticalFlip(p_of("verticalflip")))
    if p_of("downscale"):
        tl.append(Downscale(p_of("downscale"), ts["downscale"]["scale"]))
    if p_of("blur"):
        tl.append(Blur(p_of("blur"), ts["blur"]["blur_limit"]))
    if p_of("gaussnoise"):
        tl.append(GaussNoise(p_of("gaussnoise"), ts["gaussnoise"]["var_limit"]))
    if p_of("colorjitter"):
        s = ts["colorjitter"]
        tl.append(
            ColorJitter(
                p_of("colorjitter"),
                brightness=s["scale_setting"],
                contrast=s["scale_setting"],
                saturation=s["scale_color"],
                hue=s["scale_color"] / 2,
            )
        )
    if p_of("superpixels"):
        tl.append(
            Superpixels(
                p_of("superpixels"), p_replace=0.1, n_segments=200,
                max_size=input_shape // 2,
            )
        )
    if p_of("zoomblur"):
        tl.append(ZoomBlur(p_of("zoomblur"), max_factor=1.05))
    if p_of("randomsizedcrop"):
        tl.append(
            RandomSizedCrop(
                p_of("randomsizedcrop"),
                min_max_height=(input_shape // 2, input_shape),
                height=input_shape,
                width=input_shape,
            )
        )
    if p_of("elastictransform"):
        tl.append(
            ElasticTransform(p_of("elastictransform"), alpha=0.5, sigma=25, alpha_affine=15)
        )

    if "normalize" in ts:
        mean = ts["normalize"].get("mean", (0.5, 0.5, 0.5))
        std = ts["normalize"].get("std", (0.5, 0.5, 0.5))
    else:
        mean, std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    tl.append(Normalize(mean, std))
    return Compose(tl, seed=seed), Compose([Normalize(mean, std)], seed=seed)
