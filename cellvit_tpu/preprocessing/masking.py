"""Tissue masking: Otsu thresholding + morphology cleanup.

Reimplements the reference masking stack
(`preprocessing/patch_extraction/src/utils/masking.py:27-297`) without the
skimage dependency: HSV gray/black suppression, double Otsu thresholding
with small-object/hole removal and square dilation/closing, pen-marker
prefilters, and the per-patch background ratio
(`patch_util.py:935-956`).
"""

from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np
from scipy import ndimage


def rgb2gray(rgb: np.ndarray) -> np.ndarray:
    """skimage.color.rgb2gray weights (ITU-R 709)."""
    return (
        0.2125 * rgb[..., 0] + 0.7154 * rgb[..., 1] + 0.0721 * rgb[..., 2]
    ) / 255.0


def threshold_otsu(gray: np.ndarray, nbins: int = 256) -> float:
    """Otsu threshold over a histogram (skimage.filters.threshold_otsu)."""
    counts, bin_edges = np.histogram(gray.ravel(), bins=nbins)
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2
    counts = counts.astype(np.float64)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * centers) / np.maximum(w1, 1e-12)
    m2 = (np.cumsum((counts * centers)[::-1]) / np.maximum(w2[::-1], 1e-12))[::-1]
    var_between = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return float(centers[:-1][np.argmax(var_between)])


def remove_small_objects_bool(mask: np.ndarray, min_size: int) -> np.ndarray:
    lab, _ = ndimage.label(mask)
    counts = np.bincount(lab.ravel())
    keep = counts >= min_size
    keep[0] = False
    return keep[lab]


def remove_small_holes(mask: np.ndarray, area_threshold: int) -> np.ndarray:
    inv = ~mask
    lab, _ = ndimage.label(inv)
    counts = np.bincount(lab.ravel())
    small = counts < area_threshold
    small[0] = False
    return mask | small[lab]


def _square(n: int) -> np.ndarray:
    return np.ones((n, n), np.uint8)


def _mask_rgb(rgb: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Keep masked pixels, paint the rest white (masking.py mask_rgb)."""
    out = np.where(mask[..., None], rgb, 0)
    neg = np.where(~mask[..., None], rgb, 0)
    neg = 255 * (neg > 1e-4).astype(np.int32)
    return np.clip(out + neg, 0, 255).astype(np.uint8)


def apply_otsu_thresholding(tile: np.ndarray) -> np.ndarray:
    """Binary tissue mask (1 = tissue) via double Otsu
    (reference masking.py:208-243)."""
    hsv = cv2.cvtColor(tile.astype(np.uint8), cv2.COLOR_RGB2HSV)
    gray_mask = cv2.inRange(hsv, (0, 0, 70), (180, 10, 255))
    black_mask = cv2.inRange(hsv, (0, 0, 0), (180, 255, 85))
    full_tile_bg = tile.copy()
    full_tile_bg[(gray_mask | black_mask) > 0] = 255

    g = 255 * rgb2gray(full_tile_bg)
    m = g < threshold_otsu(g)
    m = remove_small_objects_bool(m, 60)
    m = cv2.dilate(m.astype(np.uint8), _square(12)) > 0
    m = cv2.morphologyEx(m.astype(np.uint8), cv2.MORPH_CLOSE, _square(5)) > 0
    m = remove_small_holes(m, 250)
    tile2 = _mask_rgb(tile, m)

    g2 = 255 * rgb2gray(tile2)
    m2 = g2 < threshold_otsu(g2)
    m2 = remove_small_holes(m2, 5000)
    # NOTE(parity): the reference inverts here (`otsu_thr = ~otsu_masking`,
    # masking.py:240) which makes 1 = background in its return convention;
    # its caller then treats 0 as tissue. We return 1 = tissue directly.
    return m2.astype(np.uint8)


def _pen_filter(rgb: np.ndarray, thresholds) -> np.ndarray:
    """Paint pixels matching any (r_cmp, r, g_cmp, g, b_cmp, b) rule white."""
    out = rgb.copy()
    r, g, b = rgb[..., 0].astype(int), rgb[..., 1].astype(int), rgb[..., 2].astype(int)
    sel = np.zeros(rgb.shape[:2], bool)
    for rt, rv, gt, gv, bt, bv in thresholds:
        m = np.ones(rgb.shape[:2], bool)
        m &= (r > rv) if rt == ">" else (r < rv)
        m &= (g > gv) if gt == ">" else (g < gv)
        m &= (b > bv) if bt == ">" else (b < bv)
        sel |= m
    out[sel] = 255
    return out


def remove_marker_filters(tile: np.ndarray) -> np.ndarray:
    """Blue/green/red pen-marker removal (reference masking.py:270-297;
    threshold tables follow the histolab pen filters the reference wraps)."""
    blue = [
        ("<", 60, "<", 120, ">", 190), ("<", 120, "<", 170, ">", 200),
        ("<", 175, "<", 210, ">", 230), ("<", 145, "<", 180, ">", 210),
        ("<", 37, "<", 95, ">", 160), ("<", 30, "<", 65, ">", 130),
        ("<", 130, "<", 155, ">", 180), ("<", 40, "<", 35, ">", 85),
        ("<", 30, "<", 20, ">", 65), ("<", 90, "<", 90, ">", 140),
        ("<", 60, "<", 60, ">", 120), ("<", 110, "<", 110, ">", 175),
    ]
    green = [
        ("<", 150, ">", 160, "<", 140), ("<", 70, ">", 110, "<", 110),
        ("<", 45, ">", 115, "<", 100), ("<", 30, ">", 75, "<", 60),
        ("<", 195, ">", 220, "<", 210), ("<", 225, ">", 230, "<", 225),
        ("<", 170, ">", 210, "<", 200), ("<", 20, ">", 30, "<", 65),
        ("<", 50, ">", 60, "<", 80), ("<", 30, ">", 45, "<", 80),
        ("<", 60, ">", 75, "<", 110), ("<", 110, ">", 125, "<", 140),
        ("<", 195, ">", 235, "<", 240), ("<", 35, ">", 30, "<", 120),
    ]
    red = [
        (">", 150, "<", 80, "<", 90), (">", 110, "<", 20, "<", 30),
        (">", 185, "<", 65, "<", 105), (">", 195, "<", 85, "<", 125),
        (">", 220, "<", 115, "<", 145), (">", 125, "<", 40, "<", 70),
        (">", 100, "<", 50, "<", 65), (">", 85, "<", 25, "<", 45),
    ]
    out = _pen_filter(tile, blue)
    out = _pen_filter(out, green)
    out = _pen_filter(out, red)
    black = (out == 0).all(axis=-1)
    out[black] = 255
    return out


def generate_tissue_mask(
    tissue_tile: np.ndarray,
    mask: Optional[np.ndarray] = None,
    apply_prefilter: bool = False,
) -> np.ndarray:
    """Thumbnail → binary tissue mask (1 = tissue), optionally restricted to
    an annotation mask and pen-marker prefiltered
    (reference masking.py:27-87)."""
    tile = tissue_tile
    if mask is not None:
        tile = np.where(mask[..., None] > 0, tile, 255).astype(np.uint8)
    if apply_prefilter:
        tile = remove_marker_filters(tile)
    tissue = apply_otsu_thresholding(tile)
    assert len(np.unique(tissue)) <= 2
    return tissue


def calculate_background_ratio(patch: np.ndarray, patch_size: int) -> float:
    """Fraction of gray/black background pixels (patch_util.py:935-956)."""
    hsv = cv2.cvtColor(patch.astype(np.uint8), cv2.COLOR_RGB2HSV)
    gray_mask = cv2.inRange(hsv, (0, 0, 70), (180, 10, 255))
    black_mask = cv2.inRange(hsv, (0, 0, 0), (180, 255, 85))
    bg = ((gray_mask | black_mask) / 255).astype(np.uint8)
    total = bg.sum() + patch_size**2 - patch.shape[0] * patch.shape[1]
    return float(total) / patch_size**2


def standardize_brightness(patches: List[np.ndarray]) -> List[np.ndarray]:
    """Joint brightness normalization: scale the whole patch batch so its
    90th-percentile intensity maps to 255 (reference patch_util.py:779-800,
    `standardize_brightness`; legacy option, off by default)."""
    if not patches:
        return patches
    p90 = float(np.percentile(np.stack(patches), 90))
    if p90 <= 0:
        return patches
    return [
        np.clip(p.astype(np.float64) * 255.0 / p90, 0, 255).astype(np.uint8)
        for p in patches
    ]
