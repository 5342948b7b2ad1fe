"""StarDist polygon NMS and rasterization.

Replaces the stardist pip package's C++/OpenCL `non_maximum_suppression` /
`polygons_to_label` used by the reference
(`cell_segmentation/utils/post_proc_stardist.py:7,50-51`; geometry helper
semantics from `utils/tools.py:212-400`):

* candidates: pixels with dist_map prob > prob_thresh;
* greedy NMS in descending probability with a bbox grid index; a candidate
  is suppressed when its rasterized star polygon overlaps a kept polygon by
  more than nms_thresh of the smaller polygon's area (the stardist C++
  criterion);
* rasterization: polygons drawn in ascending probability so higher
  probability wins overlapping pixels (tools.py polygons_to_label sorts
  ascending and overwrites).

Rays follow the reference angle convention: vertex k of a polygon at (y, x)
is (y + d_k sin φ_k, x + d_k cos φ_k), φ_k = 2πk/n.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import cv2
import numpy as np


def ray_angles(n_rays: int = 32) -> np.ndarray:
    return np.linspace(0, 2 * np.pi, n_rays, endpoint=False)


def dist_to_coord(dist: np.ndarray, points: np.ndarray) -> np.ndarray:
    """(n, n_rays) distances + (n, 2) yx centers → (n, 2, n_rays) yx
    polygon vertices (tools.py dist_to_coord)."""
    phis = ray_angles(dist.shape[1])
    coord = (dist[:, None] * np.stack([np.sin(phis), np.cos(phis)])).astype(
        np.float32
    )
    return coord + points[..., None]


def _poly_pts(coord_i: np.ndarray) -> np.ndarray:
    """(2, n_rays) yx vertex array → int32 (n_rays, 2) xy for cv2."""
    return np.stack([coord_i[1], coord_i[0]], axis=-1).round().astype(np.int32)


def polygons_to_label(
    dist: np.ndarray,
    points: np.ndarray,
    shape: Tuple[int, int],
    prob: np.ndarray = None,
) -> np.ndarray:
    """Rasterize star polygons into an int32 instance map.

    Matches tools.py polygons_to_label: ascending-probability draw order,
    label values = original candidate index + 1.
    """
    lbl = np.zeros(shape, np.int32)
    if len(points) == 0:
        return lbl
    prob = np.inf * np.ones(len(points)) if prob is None else np.asarray(prob)
    order = np.argsort(prob, kind="stable")
    coord = dist_to_coord(dist[order], points[order])
    for i, c in zip(order, coord):
        cv2.fillPoly(lbl, [_poly_pts(c)], int(i) + 1)
    return lbl


def _poly_mask_local(coord_i, x0, y0, w, h):
    canvas = np.zeros((h, w), np.uint8)
    pts = _poly_pts(coord_i) - np.array([[x0, y0]], np.int32)
    cv2.fillPoly(canvas, [pts], 1)
    return canvas


def nms_candidates_device(
    prob, dist, prob_thresh: float = 0.5, max_candidates: int = 10000
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Device-side candidate stage: threshold + descending-prob top-k on
    the accelerator, so only (k, n_rays) candidate rows cross to the host
    instead of the full (H, W, n_rays) ray maps. Ordering matches the
    host path (descending prob, raster order on ties — `lax.top_k` is
    index-stable). Returns host arrays (points yx, probs, dists)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def _topk(prob_j, dist_j, k):
        h, w = prob_j.shape
        vals, idx = jax.lax.top_k(prob_j.reshape(-1).astype(jnp.float32), k)
        ys, xs = idx // w, idx % w
        return ys, xs, vals, dist_j[ys, xs].astype(jnp.float32)

    k = min(max_candidates, int(np.prod(prob.shape)))
    ys, xs, probs, dists = jax.device_get(_topk(prob, dist, k))
    keep = probs > prob_thresh
    points = np.stack([ys[keep], xs[keep]], axis=-1).astype(np.int64)
    return points, probs[keep].astype(np.float64), dists[keep]


def non_maximum_suppression(
    dist: np.ndarray,
    prob: np.ndarray,
    prob_thresh: float = 0.5,
    nms_thresh: float = 0.4,
    max_candidates: int = 10000,
    candidates: Tuple[np.ndarray, np.ndarray, np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy polygon NMS.

    Args:
        dist: (H, W, n_rays) ray-length maps.
        prob: (H, W) object probability (the dist_map branch, after sigmoid
            — the reference passes the raw branch output; values above
            prob_thresh are candidates either way).
        candidates: optional pre-selected (points, probs, dists) from
            `nms_candidates_device` — skips the host threshold/sort.
    Returns:
        (points (n, 2) yx, probs (n,), dists (n, n_rays)) of survivors.
    """
    if candidates is not None:
        points, probs, dists = candidates
        ys, xs = points[:, 0], points[:, 1]
        if ys.size == 0:
            return (
                np.zeros((0, 2), np.int64),
                np.zeros(0),
                np.zeros((0, dist.shape[-1] if dist is not None else dists.shape[-1])),
            )
    else:
        ys, xs = np.nonzero(prob > prob_thresh)
        if ys.size == 0:
            return (
                np.zeros((0, 2), np.int64),
                np.zeros(0),
                np.zeros((0, dist.shape[-1])),
            )
        probs = prob[ys, xs]
        order = np.argsort(-probs, kind="stable")[:max_candidates]
        ys, xs, probs = ys[order], xs[order], probs[order]
        dists = dist[ys, xs]
    points = np.stack([ys, xs], axis=-1)
    coords = dist_to_coord(dists, points.astype(np.float32))  # (n, 2, n_rays)

    bx0 = np.floor(coords[:, 1].min(-1)).astype(np.int64)
    bx1 = np.ceil(coords[:, 1].max(-1)).astype(np.int64)
    by0 = np.floor(coords[:, 0].min(-1)).astype(np.int64)
    by1 = np.ceil(coords[:, 0].max(-1)).astype(np.int64)

    cell = max(8, int(np.median(bx1 - bx0)) * 2)
    grid: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    kept: List[int] = []
    areas: Dict[int, float] = {}
    masks: Dict[int, Tuple[np.ndarray, int, int]] = {}

    for i in range(len(points)):
        x0, x1, y0, y1 = bx0[i], bx1[i], by0[i], by1[i]
        suppressed = False
        cand: List[int] = []
        seen = set()
        for gx in range(x0 // cell, x1 // cell + 1):
            for gy in range(y0 // cell, y1 // cell + 1):
                for j in grid.get((gx, gy), ()):
                    if j not in seen:
                        seen.add(j)
                        if bx0[j] <= x1 and x0 <= bx1[j] and by0[j] <= y1 and y0 <= by1[j]:
                            cand.append(j)
        if cand:
            w = int(x1 - x0 + 1)
            h = int(y1 - y0 + 1)
            mi = _poly_mask_local(coords[i], x0, y0, w, h)
            ai = float(mi.sum())
            for j in cand:
                jx0, jy0 = bx0[j], by0[j]
                mj, jw, jh = masks[j]
                # overlap on the union window of both bboxes
                ux0, uy0 = min(x0, jx0), min(y0, jy0)
                ux1 = max(x1, jx0 + jw - 1)
                uy1 = max(y1, jy0 + jh - 1)
                canvas_i = np.zeros((uy1 - uy0 + 1, ux1 - ux0 + 1), np.uint8)
                canvas_i[y0 - uy0 : y0 - uy0 + h, x0 - ux0 : x0 - ux0 + w] = mi
                canvas_j = np.zeros_like(canvas_i)
                canvas_j[jy0 - uy0 : jy0 - uy0 + jh, jx0 - ux0 : jx0 - ux0 + jw] = mj
                inter = float((canvas_i & canvas_j).sum())
                if inter / max(min(ai, areas[j]), 1.0) > nms_thresh:
                    suppressed = True
                    break
        if not suppressed:
            kept.append(i)
            w = int(x1 - x0 + 1)
            h = int(y1 - y0 + 1)
            mi = _poly_mask_local(coords[i], x0, y0, w, h)
            masks[i] = (mi, w, h)
            areas[i] = float(mi.sum())
            for gx in range(x0 // cell, x1 // cell + 1):
                for gy in range(y0 // cell, y1 // cell + 1):
                    grid[(gx, gy)].append(i)

    kept_arr = np.asarray(kept, np.int64)
    return points[kept_arr], probs[kept_arr], dists[kept_arr]


class StarDistPostProcessor:
    """dist/stardist/type maps → instance map + per-instance dicts
    (reference post_proc_stardist.py:13-123, channel-last interface)."""

    def __init__(self, nr_types: int = 6, image_shape: Tuple[int, int] = (256, 256)):
        self.nr_types = nr_types
        self.image_shape = image_shape

    def post_proc_stardist(
        self,
        dist_map: np.ndarray,  # (H, W)
        stardist_map: np.ndarray,  # (H, W, n_rays)
        type_prob: np.ndarray,  # (H, W, num_types)
    ) -> Tuple[np.ndarray, Dict[int, Dict], np.ndarray]:
        from cellvit_tpu.eval.metrics import remap_label
        from cellvit_tpu.ops.instance_stats import contours_from_instance_map

        if not isinstance(dist_map, np.ndarray):
            # jax arrays in → run the candidate stage on device and move
            # only the top-k rows to host (greedy NMS stays host-side)
            cand = nms_candidates_device(dist_map, stardist_map)
            points, probs, dists = non_maximum_suppression(
                None, None, candidates=cand
            )
            type_prob = np.asarray(type_prob)
        else:
            points, probs, dists = non_maximum_suppression(stardist_map, dist_map)
        pred_type = np.argmax(type_prob, axis=-1)
        inst = remap_label(
            polygons_to_label(dists, points, self.image_shape, prob=probs)
        )

        info: Dict[int, Dict] = {}
        contours = contours_from_instance_map(inst)
        for inst_id, contour in contours.items():
            sel = inst == inst_id
            ys, xs = np.nonzero(sel)
            vals, counts = np.unique(pred_type[sel], return_counts=True)
            order = np.argsort(-counts, kind="stable")
            t = vals[order][0]
            if t == 0 and len(vals) > 1:
                t = vals[order][1]
            count_t = counts[order][0] if t == vals[order][0] else counts[order][1]
            info[int(inst_id)] = {
                "bbox": np.array([[ys.min(), xs.min()], [ys.max() + 1, xs.max() + 1]]),
                "centroid": np.array([xs.mean(), ys.mean()]),
                "contour": contour,
                "type": int(t),
                "type_prob": float(count_t / (sel.sum() + 1e-6)),
            }

        type_nuclei_map = np.zeros((*self.image_shape, self.nr_types), np.int32)
        for inst_id, spec in info.items():
            type_nuclei_map[..., spec["type"]][inst == inst_id] = inst_id
        return inst, info, type_nuclei_map
