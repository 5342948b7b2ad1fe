"""Batched on-device HV→instance postprocessing (the reference's CPU
bottleneck, moved onto the TPU).

`instance_map_batch` reproduces the semantics of
`post_proc_cellvit.py:155-249` (`__proc_np_hv`) for a whole batch of tiles
without leaving the device: thresholds, connected components, small-object
removal, cv2-parity Sobel/Gaussian filtering (banded-matrix matmuls),
marker construction (hole filling + 5×5-ellipse opening) and a
quantized-flood watershed. The reference runs this per-image on the host
with cv2/scipy — a GPU→CPU sync every training step and THE WSI-inference
bottleneck (SURVEY §3.1/§3.2); here it is one jit region, vmapped over the
batch, fusible with the model forward pass.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cellvit_tpu.ops import cc, filters
from cellvit_tpu.ops.watershed import watershed


def _proc_single(
    np_prob: jnp.ndarray,
    hv_map: jnp.ndarray,
    object_size: int,
    ksize: int,
    cc_iters: int,
) -> jnp.ndarray:
    h, w = np_prob.shape
    n_seg = h * w // 2 + 2

    fg = np_prob >= 0.5
    # only the cleaned mask is needed here — skip label compaction
    lab = cc.connected_components(fg, max_iters=cc_iters, compact=False)
    lab = cc.remove_small_objects(lab, 10, h * w + 1)
    blb = lab > 0
    blbf = blb.astype(jnp.float32)

    h_dir = filters.minmax_normalize(hv_map[..., 0].astype(jnp.float32))
    v_dir = filters.minmax_normalize(hv_map[..., 1].astype(jnp.float32))
    sobelh = 1.0 - filters.minmax_normalize(filters.sobel(h_dir, 1, 0, ksize))
    sobelv = 1.0 - filters.minmax_normalize(filters.sobel(v_dir, 0, 1, ksize))

    overall = jnp.maximum(sobelh, sobelv) - (1.0 - blbf)
    overall = jnp.maximum(overall, 0.0)

    dist = -filters.gaussian_blur_3x3((1.0 - overall) * blbf)

    marker = blb & ~(overall >= 0.4)
    marker = cc.fill_holes(marker, max_iters=cc_iters)
    marker = cc.morph_open(marker)
    marker_lab = cc.connected_components(marker, max_iters=cc_iters)
    marker_lab = cc.remove_small_objects(marker_lab, object_size, n_seg)

    return watershed(dist, marker_lab, blb)


@partial(jax.jit, static_argnames=("object_size", "ksize", "cc_iters"))
def instance_map_batch(
    np_prob: jnp.ndarray,
    hv_map: jnp.ndarray,
    object_size: int = 10,
    ksize: int = 21,
    cc_iters: int = 64,
) -> jnp.ndarray:
    """Batched HV postprocessing.

    Args:
        np_prob: (B, H, W) nucleus probability (softmax channel 1).
        hv_map: (B, H, W, 2) regressed HV maps.
        object_size / ksize: magnification params (10/21 at 40×, 3/11 at 20×;
            reference post_proc_cellvit.py:55-65).
    Returns:
        (B, H, W) int32 instance maps (0 = background). Label ids follow the
        watershed-marker numbering; use `cellvit_tpu.ops.instance_stats` to
        compact and summarize.
    """
    fn = partial(
        _proc_single, object_size=object_size, ksize=ksize, cc_iters=cc_iters
    )
    return jax.vmap(fn)(np_prob, hv_map)
