"""Host (numpy) oracle for HoVer-Net HV→instance postprocessing.

Reimplements the semantics of the reference pipeline
(`cell_segmentation/utils/post_proc_cellvit.py:155-249`):

  threshold NP≥0.5 → 4-connected label → remove objects <10 px → min-max
  normalize H/V → Sobel k=21 (40×) / k=11 (20×) → inverted edge map →
  distance map → 3×3 Gaussian → marker = fill_holes(blb − edges≥0.4) →
  5×5-ellipse morphological opening → label → remove objects <object_size →
  marker-controlled watershed(dist, markers, mask).

skimage/numba are not available here, so `watershed` is our own
priority-flood implementation with skimage's semantics (4-connectivity,
value-then-insertion-order priority). cv2/scipy supply Sobel, Gaussian,
labeling and hole filling on the host path; the batched TPU pipeline in
`cellvit_tpu.ops.hv_postproc` is tested against this oracle.
"""

from __future__ import annotations

import heapq
from typing import Tuple

import cv2
import numpy as np
from scipy import ndimage


def remove_small_objects(labeled: np.ndarray, min_size: int) -> np.ndarray:
    """Zero out connected components smaller than min_size pixels
    (semantics of skimage.morphology.remove_small_objects on a labeled map,
    as used by the reference via its `utils/tools.py` copy)."""
    if min_size <= 0:
        return labeled
    counts = np.bincount(labeled.ravel())
    too_small = counts < min_size
    too_small[0] = False
    out = labeled.copy()
    out[too_small[labeled]] = 0
    return out


def watershed(
    image: np.ndarray, markers: np.ndarray, mask: np.ndarray
) -> np.ndarray:
    """Marker-controlled watershed by priority flooding (4-connectivity).

    Pixels flood in increasing order of `image` value with FIFO tie-break,
    matching skimage.segmentation.watershed defaults.
    """
    h, w = image.shape
    labels = np.where(mask, markers, 0).astype(np.int32)
    heap: list = []
    counter = 0
    ys, xs = np.nonzero(labels > 0)  # raster order, as skimage seeds
    for y, x in zip(ys.tolist(), xs.tolist()):
        heapq.heappush(heap, (float(image[y, x]), counter, y, x))
        counter += 1
    mask = mask.astype(bool)
    while heap:
        _, _, y, x = heapq.heappop(heap)
        lbl = labels[y, x]
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and labels[ny, nx] == 0:
                labels[ny, nx] = lbl
                heapq.heappush(heap, (float(image[ny, nx]), counter, ny, nx))
                counter += 1
    return labels


def _minmax(x: np.ndarray) -> np.ndarray:
    """cv2.normalize(NORM_MINMAX, alpha=0, beta=1) semantics."""
    lo, hi = float(x.min()), float(x.max())
    if hi - lo == 0:
        return np.zeros_like(x, dtype=np.float32)
    return ((x - lo) / (hi - lo)).astype(np.float32)


def proc_np_hv(
    np_prob: np.ndarray,
    hv_map: np.ndarray,
    object_size: int = 10,
    ksize: int = 21,
) -> np.ndarray:
    """NP-probability + HV maps → int32 instance map (one image).

    Args:
        np_prob: (H, W) nucleus probability (softmax channel 1).
        hv_map: (H, W, 2) regressed horizontal/vertical maps.
        object_size: marker min size (10 at 40×, 3 at 20×).
        ksize: Sobel aperture (21 at 40×, 11 at 20×).
    """
    blb = (np_prob >= 0.5).astype(np.int32)
    blb = ndimage.label(blb)[0]
    blb = remove_small_objects(blb, min_size=10)
    blb = (blb > 0).astype(np.float32)

    h_dir = _minmax(hv_map[..., 0].astype(np.float32))
    v_dir = _minmax(hv_map[..., 1].astype(np.float32))

    sobelh = cv2.Sobel(h_dir, cv2.CV_64F, 1, 0, ksize=ksize)
    sobelv = cv2.Sobel(v_dir, cv2.CV_64F, 0, 1, ksize=ksize)
    sobelh = 1.0 - _minmax(sobelh)
    sobelv = 1.0 - _minmax(sobelv)

    overall = np.maximum(sobelh, sobelv)
    overall = overall - (1.0 - blb)
    overall[overall < 0] = 0.0

    dist = (1.0 - overall) * blb
    dist = -cv2.GaussianBlur(dist, (3, 3), 0)

    overall_bin = (overall >= 0.4).astype(np.int32)
    marker = blb.astype(np.int32) - overall_bin
    marker[marker < 0] = 0
    marker = ndimage.binary_fill_holes(marker).astype(np.uint8)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    marker = cv2.morphologyEx(marker, cv2.MORPH_OPEN, kernel)
    marker = ndimage.label(marker)[0]
    marker = remove_small_objects(marker, min_size=object_size)

    return watershed(dist, marker, mask=blb > 0).astype(np.int32)


def magnification_params(magnification: int, gt: bool = False) -> Tuple[int, int]:
    """(object_size, ksize) per magnification — reference
    post_proc_cellvit.py:55-65."""
    if gt:
        return 100, 21
    if magnification == 40:
        return 10, 21
    if magnification == 20:
        return 3, 11
    raise NotImplementedError(f"unknown magnification {magnification}")
