"""Per-instance statistics on device via segment reductions.

Replaces the reference's per-instance host loops
(`post_proc_cellvit.py:95-153`: get_bounding_box, cv2.moments centroid,
majority-vote typing) with batched scatter-adds over the whole label map —
O(H·W) total instead of O(instances · crop), and the maps never leave the
device. Contour extraction stays on the host (`contours_from_instance_map`)
because contours are inherently ragged; everything else is fixed-capacity
padded arrays.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def relabel_consecutive(inst: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Renumber (H, W) labels to consecutive 1..N preserving order
    (device equivalent of `remap_label(pred, by_size=False)`)."""
    present = jnp.zeros(num_segments, bool).at[inst.reshape(-1)].max(inst.reshape(-1) > 0)
    new_id = jnp.cumsum(present.astype(jnp.int32))
    return jnp.where(inst > 0, new_id[inst], 0).astype(jnp.int32)


def _stats_single(
    inst: jnp.ndarray,
    type_map: jnp.ndarray,
    np_prob: jnp.ndarray,
    max_instances: int,
    num_classes: int,
) -> Dict[str, jnp.ndarray]:
    h, w = inst.shape
    k = max_instances + 1  # slot 0 = background
    flat = jnp.clip(inst.reshape(-1), 0, max_instances)

    area = jnp.zeros(k, jnp.int32).at[flat].add(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)

    sum_r = jnp.zeros(k, jnp.float32).at[flat].add(rows.astype(jnp.float32))
    sum_c = jnp.zeros(k, jnp.float32).at[flat].add(cols.astype(jnp.float32))
    rmin = jnp.full(k, h, jnp.int32).at[flat].min(rows)
    rmax = jnp.full(k, -1, jnp.int32).at[flat].max(rows)
    cmin = jnp.full(k, w, jnp.int32).at[flat].min(cols)
    cmax = jnp.full(k, -1, jnp.int32).at[flat].max(cols)

    valid = area > 0
    af = jnp.maximum(area.astype(jnp.float32), 1.0)
    centroid = jnp.stack([sum_c / af, sum_r / af], axis=-1)  # (x, y) like cv2
    bbox = jnp.stack([rmin, rmax + 1, cmin, cmax + 1], axis=-1)

    # majority-vote type per instance, with the reference's "skip background
    # unless it is the only type" rule (post_proc_cellvit.py:141-149)
    tflat = jnp.clip(type_map.reshape(-1), 0, num_classes - 1)
    tcounts = (
        jnp.zeros((k, num_classes), jnp.int32)
        .at[flat, tflat]
        .add(1)
    )
    top = jnp.argmax(tcounts, axis=-1)
    counts_no_bg = tcounts.at[:, 0].set(-1)
    second = jnp.argmax(counts_no_bg, axis=-1)
    has_nonbg = jnp.max(tcounts[:, 1:], axis=-1) > 0
    inst_type = jnp.where((top == 0) & has_nonbg, second, top)
    type_count = jnp.take_along_axis(tcounts, inst_type[:, None], axis=-1)[:, 0]
    type_prob = type_count.astype(jnp.float32) / (area.astype(jnp.float32) + 1e-6)

    # mean NP probability per instance (useful confidence signal)
    sum_p = jnp.zeros(k, jnp.float32).at[flat].add(np_prob.reshape(-1))
    mean_prob = sum_p / af

    drop_bg = lambda a: a[1:]
    return {
        "valid": drop_bg(valid),
        "area": drop_bg(area),
        "centroid": drop_bg(centroid),
        "bbox": drop_bg(bbox),
        "type": drop_bg(inst_type).astype(jnp.int32),
        "type_prob": drop_bg(type_prob),
        "mean_prob": drop_bg(mean_prob),
    }


@partial(jax.jit, static_argnames=("max_instances", "num_classes"))
def instance_stats_batch(
    inst_map: jnp.ndarray,
    type_map: jnp.ndarray,
    np_prob: Optional[jnp.ndarray] = None,
    max_instances: int = 1024,
    num_classes: int = 6,
) -> Dict[str, jnp.ndarray]:
    """Fixed-capacity per-instance stats for a batch.

    Args:
        inst_map: (B, H, W) int32 instance labels with consecutive ids
            starting at 1 (relabel with `relabel_consecutive` first if not).
        type_map: (B, H, W) int32 argmax nuclei-type map.
        np_prob: optional (B, H, W) nucleus probability for confidences.
        max_instances: capacity K; instances with id > K are clipped into
            slot K (choose comfortably above the per-tile maximum).
    Returns:
        dict of (B, K, …) arrays: valid, area, centroid (x, y), bbox
        (rmin, rmax, cmin, cmax; max-exclusive), type, type_prob, mean_prob.
    """
    if np_prob is None:
        np_prob = jnp.zeros(inst_map.shape, jnp.float32)
    fn = partial(
        _stats_single, max_instances=max_instances, num_classes=num_classes
    )
    return jax.vmap(fn)(inst_map, type_map, np_prob)


def contours_from_instance_map(
    inst_map: np.ndarray, valid_ids: Optional[np.ndarray] = None
) -> Dict[int, np.ndarray]:
    """Host contour extraction (cv2, CHAIN_APPROX_SIMPLE) per instance —
    matches the reference contour protocol (post_proc_cellvit.py:106-123).
    Returns {instance_id: (N, 2) int32 contour in (x, y)}; instances whose
    contour degenerates (<3 points) are skipped like the reference."""
    import cv2

    out: Dict[int, np.ndarray] = {}
    ids = valid_ids if valid_ids is not None else np.unique(inst_map)
    for inst_id in ids:
        if inst_id == 0:
            continue
        mask = inst_map == inst_id
        ys, xs = np.nonzero(mask)
        if ys.size == 0:
            continue
        rmin, rmax = ys.min(), ys.max() + 1
        cmin, cmax = xs.min(), xs.max() + 1
        crop = mask[rmin:rmax, cmin:cmax].astype(np.uint8)
        contours, _ = cv2.findContours(
            crop, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
        )
        contour = np.squeeze(contours[0].astype(np.int32))
        if contour.ndim != 2 or contour.shape[0] < 3:
            continue
        contour = contour + np.array([[cmin, rmin]], np.int32)
        out[int(inst_id)] = contour
    return out
