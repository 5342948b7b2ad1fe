"""Annotation overview plotting for preprocessed WSIs.

Parity target: reference `preprocessing/patch_extraction/src/utils/
plotting.py:24-157` (`generate_polygon_overview`) — per unique annotation
label, a translucent filled-polygon overlay (opacity 180/255, 5 px outline)
on the slide thumbnail, on a white canvas, and optionally on the tissue-grid
image, plus a combined all-labels overlay. The reference rasterizes through
rasterio/shapely; here plain cv2 fills do the same job.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

# reference preprocessing/src/config.py COLOR_DEFINITIONS equivalent:
# deterministic palette indexed by label id (id 0 = background, unused)
_PALETTE = np.array(
    [
        (0, 0, 0),
        (255, 87, 51),
        (51, 116, 255),
        (46, 204, 113),
        (241, 196, 15),
        (155, 89, 182),
        (26, 188, 156),
        (230, 126, 34),
        (52, 73, 94),
        (231, 76, 60),
        (22, 160, 133),
    ],
    np.uint8,
)


def label_color(label_id: int) -> Sequence[int]:
    return tuple(int(c) for c in _PALETTE[label_id % len(_PALETTE)])


def generate_polygon_overview(
    polygons: Sequence[np.ndarray],
    region_labels: Sequence[str],
    label_map: Dict[str, int],
    thumbnail: np.ndarray,
    downsample: float = 1.0,
    tissue_grid: Optional[np.ndarray] = None,
    opacity: float = 180 / 255,
    outline_width: int = 5,
) -> Dict[str, np.ndarray]:
    """Per-label annotation overlays.

    `polygons` are level-0 referenced (N, 2) float arrays; `downsample`
    maps them into thumbnail coordinates. Returns a dict of RGB images:
    `<label>` (thumbnail overlay), `<label>_clean` (white background),
    `<label>_grid` (tissue-grid overlay, if provided) and `all_overlays`.
    """
    out: Dict[str, np.ndarray] = {}
    white = np.full_like(thumbnail, 255)
    combined = thumbnail.astype(np.float32).copy()

    for label in sorted(set(region_labels)):
        lbl_id = label_map.get(label)
        if lbl_id is None:
            continue
        color = np.array(label_color(lbl_id), np.float32)
        pts = [
            np.round(p / downsample).astype(np.int32)
            for p, l in zip(polygons, region_labels)
            if l == label
        ]
        mask = np.zeros(thumbnail.shape[:2], np.uint8)
        cv2.fillPoly(mask, pts, 1)
        m = (mask > 0)[..., None].astype(np.float32) * opacity

        def blend(bg: np.ndarray) -> np.ndarray:
            img = bg.astype(np.float32) * (1 - m) + color * m
            img = img.astype(np.uint8)
            cv2.polylines(
                img, pts, isClosed=True,
                color=tuple(int(c) for c in color), thickness=outline_width,
            )
            return img

        out[label] = blend(thumbnail)
        out[f"{label}_clean"] = blend(white)
        if tissue_grid is not None:
            out[f"{label}_grid"] = blend(tissue_grid)
        combined = combined * (1 - m) + color * m
        cv2.polylines(
            combined, pts, isClosed=True,
            color=tuple(float(c) for c in color), thickness=outline_width,
        )

    out["all_overlays"] = combined.astype(np.uint8)
    return out
