"""Batched on-device HV→instance postprocessing (the reference's CPU
bottleneck, moved onto the TPU).

`instance_map_batch` reproduces the semantics of
`post_proc_cellvit.py:155-249` (`__proc_np_hv`) for a whole batch of tiles
without leaving the device: thresholds, connected components, small-object
removal, cv2-parity Sobel/Gaussian filtering, marker construction (hole
filling + 5×5-ellipse opening) and a quantized-flood watershed. The
reference runs this per-image on the host with cv2/scipy — a GPU→CPU sync
every training step and THE WSI-inference bottleneck (SURVEY §3.1/§3.2);
here it is one jit region fusible with the model forward pass.

On TPU, connected components and hole filling run as Pallas kernels that
keep the whole image in VMEM (`cellvit_tpu.ops.cc_pallas` — profiled ~5×
faster than the XLA segmented-scan fallback used on CPU).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cellvit_tpu.ops import cc, filters
from cellvit_tpu.ops.watershed import watershed


@partial(
    jax.jit,
    static_argnames=("object_size", "ksize", "cc_iters", "use_pallas", "levels"),
)
def _instance_map_impl(
    np_prob: jnp.ndarray,
    hv0: jnp.ndarray,
    hv1: jnp.ndarray,
    object_size: int,
    ksize: int,
    cc_iters: int,
    use_pallas: bool,
    levels: int,
) -> jnp.ndarray:
    b, h, w = np_prob.shape

    if use_pallas:
        from cellvit_tpu.ops.cc_pallas import (
            compact_root_labels_pallas,
            connected_components_pallas,
            fill_holes_pallas,
        )

        # nuclei blobs converge in 2 propagation passes, U-shapes in 3;
        # marker holes are a few pixels wide — 2 flood passes suffice
        label_roots = lambda m: connected_components_pallas(m, n_outer=3)
        fill = lambda m: fill_holes_pallas(m, n_outer=2)
        # rank-propagation compaction: the gather formulation costs ~66 ms
        # at 8×1024² (round-3 profiling); the Pallas flood ~3 ms
        compact = lambda l: compact_root_labels_pallas(l, n_outer=3)
        # size filter: the XLA windowed equality count wins. Measured
        # alternatives at 8×1024² (round 3, all exact-equivalent):
        # windowed 16.4 ms standalone (9.1 + 20.5 composed for the two
        # calls) · MXU radix-histogram bincount in XLA 28 ms (HBM-bound on
        # the (N, bins) one-hots — cc.remove_small_objects_bincount) · the
        # same math as VMEM Pallas kernels 36.7 ms (small-matmul relayouts
        # — cc_pallas.remove_small_objects_bincount_pallas) · Pallas roll
        # variant: pathological Mosaic compile (>40 min at 1024²).
        rm_small = lambda l, ms: jax.vmap(
            lambda x: cc.remove_small_objects_window(x, ms)
        )(l)
        rm_small_compacted = rm_small
        # NB: watershed stays on the XLA version even here — the frontier
        # schedule visits only levels that have adoptable pixels (HV markers
        # are pre-grown blobs with thin unlabeled ridge bands), beating both
        # the fixed sweep and the Pallas fixed-64-level kernel; the Pallas
        # kernel wins 2.6× on point-seeded floods (cc_pallas.watershed_pallas)
        flood = jax.vmap(partial(watershed, levels=levels))
    else:
        label_roots = jax.vmap(
            lambda m: cc.connected_components(m, max_iters=cc_iters, compact=False)
        )
        fill = jax.vmap(lambda m: cc.fill_holes(m, max_iters=cc_iters))
        flood = jax.vmap(partial(watershed, levels=levels))
        compact = jax.vmap(cc.compact_root_labels)
        # scatter-free size filter (CPU path; MXU bincount has no edge here)
        rm_small = lambda l, ms: jax.vmap(
            lambda x: cc.remove_small_objects_window(x, ms)
        )(l)
        rm_small_compacted = rm_small

    fg = np_prob >= 0.5
    lab = label_roots(fg)
    lab = rm_small(lab, 10)
    blb = lab > 0
    blbf = blb.astype(jnp.float32)

    h_dir = filters.minmax_normalize(hv0.astype(jnp.float32))
    v_dir = filters.minmax_normalize(hv1.astype(jnp.float32))
    sobelh = 1.0 - filters.minmax_normalize(filters.sobel(h_dir, 1, 0, ksize))
    sobelv = 1.0 - filters.minmax_normalize(filters.sobel(v_dir, 0, 1, ksize))

    overall = jnp.maximum(sobelh, sobelv) - (1.0 - blbf)
    overall = jnp.maximum(overall, 0.0)
    dist = -filters.gaussian_blur_3x3((1.0 - overall) * blbf)

    marker = blb & ~(overall >= 0.4)
    marker = fill(marker)
    marker = jax.vmap(cc.morph_open)(marker)
    marker_lab = label_roots(marker)
    marker_lab = compact(marker_lab)
    marker_lab = rm_small_compacted(marker_lab, object_size)

    return flood(dist, marker_lab, blb)


def instance_map_batch(
    np_prob: jnp.ndarray,
    hv_map: jnp.ndarray,
    object_size: int = 10,
    ksize: int = 21,
    cc_iters: int = 64,
    use_pallas: Optional[bool] = None,
    levels: int = 64,
) -> jnp.ndarray:
    """Batched HV postprocessing.

    Args:
        np_prob: (B, H, W) nucleus probability (softmax channel 1).
        hv_map: (B, H, W, 2) regressed HV maps.
        object_size / ksize: magnification params (10/21 at 40×, 3/11 at
            20×; reference post_proc_cellvit.py:55-65).
        use_pallas: force the Pallas (TPU) or XLA (CPU) kernel path;
            default picks by backend.
        levels: watershed relief quantization levels (see ops/watershed.py;
            PQ impact measured by eval/pq_delta.py — see docs/PARITY.md).
    Returns:
        (B, H, W) int32 instance maps (0 = background). Label ids follow
        the watershed-marker numbering; use `cellvit_tpu.ops.instance_stats`
        to summarize.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    return _instance_map_impl(
        np_prob, hv_map[..., 0], hv_map[..., 1], object_size, ksize,
        cc_iters, use_pallas, levels,
    )


def instance_map_batch_maps(
    np_prob: jnp.ndarray,
    hv0: jnp.ndarray,
    hv1: jnp.ndarray,
    object_size: int = 10,
    ksize: int = 21,
    cc_iters: int = 64,
    use_pallas: Optional[bool] = None,
    levels: int = 64,
) -> jnp.ndarray:
    """`instance_map_batch` taking the H/V channels as separate (B, H, W)
    maps. This is the layout-friendly entry: a channel-minor (B, H, W, 2)
    tensor is lane-padded 64× in HBM on TPU, so producers that can emit
    W-minor scalar maps (`models/fused.py:fused_forward_maps`) skip that
    tax (measured −3.5 ms at 8×1024², round 4)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    return _instance_map_impl(
        np_prob, hv0, hv1, object_size, ksize, cc_iters, use_pallas, levels
    )
