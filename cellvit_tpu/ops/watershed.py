"""Marker-controlled watershed as a jit-compatible XLA op.

Replaces skimage.segmentation.watershed in the reference HV postprocessing
(`post_proc_cellvit.py:247`). The host algorithm is an inherently sequential
priority flood; on TPU we approximate it with a *quantized level flood*:

  1. quantize the relief into L levels;
  2. for each level (ascending), repeatedly let unlabeled in-mask pixels
     whose quantized height ≤ current level adopt the label of their
     "best" labeled 4-neighbor (lowest quantized height, ties by fixed
     direction order);
  3. finish with a stabilization loop so every reachable pixel is labeled.

This reproduces the flooding order at level granularity; only contested
ridge pixels between two basins can differ from the exact heap-based flood
(validated against `hv_postproc_np.watershed` in tests). All state is
(H, W) int32/bool arrays updated with shifts — pure VPU work, batched via
vmap, nothing leaves HBM.

Two schedules (same quantized-flood semantics):

* ``"frontier"`` (default): a single `while_loop` whose level is computed
  each iteration, per pixel, as the minimum quantized height over the
  current frontier (unlabeled in-mask pixels with a labeled neighbor)
  within a 31×31 window — empty levels are never visited, each level is
  stabilized exactly as long as it keeps adopting, and distant basins
  flood concurrently (see `_flood_frontier` for why the level is local:
  the round-4 global level needed ~1700 serialized passes at production
  1024² density and was silently truncated by its 512-iteration cap).
* ``"sweep"``: the original fixed ascending level sweep (kept as the
  reference for `ops/cc_pallas.watershed_pallas`, which implements the
  same fixed schedule in VMEM).

The frontier schedule is *more* order-faithful than the sweep: every pixel
is adopted at its own quantized level with full stabilization, whereas the
sweep gives each level only `inner_iters` passes and mops up leftovers in
an unrestricted final flood.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SHIFTS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _shift(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    padded = jnp.pad(x, 1, constant_values=fill)
    return padded[1 + dy : 1 + dy + x.shape[0], 1 + dx : 1 + dx + x.shape[1]]


def _adopt(lab: jnp.ndarray, q: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """One propagation step: unlabeled active pixels adopt the label of the
    labeled neighbor with minimal quantized height (tie: N, S, W, E)."""
    best_lab = jnp.zeros_like(lab)
    best_q = jnp.full(q.shape, jnp.int32(2**30))
    for dy, dx in _SHIFTS:
        nb_lab = _shift(lab, dy, dx, 0)
        nb_q = _shift(q, dy, dx, 2**30)
        cand = nb_lab > 0
        better = cand & (nb_q < best_q)
        best_lab = jnp.where(better, nb_lab, best_lab)
        best_q = jnp.where(better, nb_q, best_q)
    take = active & (lab == 0) & (best_lab > 0)
    return jnp.where(take, best_lab, lab)


def _flood_frontier(
    q: jnp.ndarray,
    lab: jnp.ndarray,
    mask: jnp.ndarray,
    max_iters: int,
    faithful_iters: int = 256,
    ramp_every: int = 4,
) -> jnp.ndarray:
    """Frontier-driven flood: adopt at the *windowed* min frontier level.

    Each iteration finds the unlabeled in-mask pixels that touch a label
    (the frontier) and computes, per pixel, the minimum quantized height of
    any frontier pixel within a 31×31 neighborhood (separable shift-min
    doubling); an adopt pass is gated at that local level. Flood ordering
    only matters between basins that compete for the same pixels — a
    nuclei-scale phenomenon — so the local level preserves the exact
    schedule where it decides anything while distant basins flood
    concurrently. Terminates when an adopt pass changes nothing.

    **Why windowed (round 5).** The original GLOBAL min level serializes
    every basin in the image through one level schedule: ~40 passes on
    sparse bench content but ~1700-2400 at production-density 1024² tiles
    (~450 nuclei — per-nucleus interior plateaus flood 1 px/pass, one
    nucleus at a time). The old fixed `max_iters=512` silently truncated
    such floods, leaving ~40% of the foreground unlabeled (−0.21 bPQ at
    1024², caught by the first `eval/pq_delta --size 1024` run). The
    windowed level matches the CONVERGED global schedule to within 0-4 px
    per tile on every measured content (256² sparse: 0/65k px differ;
    3×1024² dense tiles: 0/0/4 px of ~43k fg; agreement 0.9956 /
    ΔbPQ +0.0003 vs the exact heap flood) in 240-283 passes — and even
    sparse content converges faster (79 vs 129 passes at 256²) because
    independent basins no longer wait on each other's levels.

    `faithful_iters`/`ramp_every` keep a worst-case completion bound: after
    `faithful_iters` exactly-scheduled passes the gate gains
    `(it − faithful) // ramp_every` levels. Every pass still adopts at
    least one pixel (each window's arg-min frontier pixel qualifies by
    construction, so `changed` cannot go false before the frontier is
    empty), and the ramp bounds the tail at ~`ramp_every · levels` passes
    (cumulative-sweep ordering, measured −0.002 bPQ when it decides
    alone); no measured content reaches it."""
    big = jnp.int32(2**30)

    def _shift_s(x, axis, s):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (max(s, 0), max(-s, 0))
        padded = jnp.pad(x, pad, constant_values=2**30)
        start = [0, 0]
        start[axis] = max(-s, 0)
        return jax.lax.dynamic_slice(padded, start, x.shape)

    def local_min(x):
        # separable min-pool of radius 15 (31×31 window) via shift-min
        # doubling: y_{k+1} = min(y_k, y_k shifted ±2^k) grows the covered
        # radius 1→3→7→15. Pure pads/mins — a reduce_window formulation
        # pushed the composed one-jit WSI device stage 3.2 MB over the
        # 128 MB VMEM program budget (windowed double-buffering next to
        # the Pallas compaction kernel) and compiled far slower.
        for axis in (0, 1):
            for s in (1, 2, 4, 8):
                x = jnp.minimum(
                    x,
                    jnp.minimum(
                        _shift_s(x, axis, s), _shift_s(x, axis, -s)
                    ),
                )
        return x

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        lab, _, it = state
        nbr = jnp.zeros(lab.shape, bool)
        for dy, dx in _SHIFTS:
            nbr = nbr | (_shift(lab, dy, dx, 0) > 0)
        frontier = mask & (lab == 0) & nbr
        lvl = local_min(jnp.where(frontier, q, big))
        lvl = lvl + jnp.maximum(it - faithful_iters, 0) // ramp_every
        new = _adopt(lab, q, mask & (q <= lvl))
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab, jnp.asarray(True), jnp.int32(0))
    )
    return lab


def watershed(
    image: jnp.ndarray,
    markers: jnp.ndarray,
    mask: jnp.ndarray,
    levels: int = 64,
    inner_iters: int = 4,
    max_final_iters: int = 4096,
    schedule: str = "frontier",
) -> jnp.ndarray:
    """Flood `markers` over `image` within `mask` (4-connectivity).

    Args:
        image: (H, W) relief (lower floods first).
        markers: (H, W) int32 seed labels (0 = unseeded).
        mask: (H, W) bool region to label.
        schedule: "frontier" (dynamic level skipping, default) or "sweep"
            (fixed ascending level loop — see module docstring).
    Returns:
        (H, W) int32 labels.
    """
    lo = jnp.min(jnp.where(mask, image, jnp.inf))
    hi = jnp.max(jnp.where(mask, image, -jnp.inf))
    rng = jnp.where(hi > lo, hi - lo, 1.0)
    q = jnp.clip(((image - lo) / rng * (levels - 1)), 0, levels - 1).astype(jnp.int32)

    lab = jnp.where(mask, markers, 0).astype(jnp.int32)

    if schedule == "frontier":
        return _flood_frontier(q, lab, mask, max_final_iters)
    assert schedule == "sweep", schedule

    def level_body(lvl, lab):
        active = mask & (q <= lvl)

        def inner(_, lab):
            return _adopt(lab, q, active)

        return jax.lax.fori_loop(0, inner_iters, inner, lab)

    lab = jax.lax.fori_loop(0, levels, level_body, lab)

    # stabilization: keep flooding until every reachable pixel is labeled
    def cond(state):
        lab, changed, it = state
        return jnp.logical_and(changed, it < max_final_iters)

    def body(state):
        lab, _, it = state
        new = _adopt(lab, q, mask)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab, jnp.asarray(True), 0))
    return lab
