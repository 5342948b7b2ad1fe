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
  each iteration as the minimum quantized height over the current frontier
  (unlabeled in-mask pixels with a labeled neighbor). Empty levels are
  never visited and each level is stabilized exactly as long as it keeps
  adopting — on HV postprocessing inputs (pre-grown blob markers, thin
  unlabeled ridge bands) this needs ~10-40 adopt passes instead of the
  sweep's fixed `levels × inner_iters` (256) + stabilization.
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
    q: jnp.ndarray, lab: jnp.ndarray, mask: jnp.ndarray, max_iters: int
) -> jnp.ndarray:
    """Frontier-driven flood: adopt at `lvl = min q over the frontier`.

    Each iteration finds the unlabeled in-mask pixels that touch a label
    (the frontier), takes the minimum quantized height among them as the
    current level, and runs one adopt pass gated at that level. Levels with
    no adoptable pixel are skipped entirely; low-q pockets unlocked later
    pull the level back down, preserving ascending flood order per pixel.
    Terminates when an adopt pass changes nothing (frontier empty)."""
    big = jnp.int32(2**30)

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        lab, _, it = state
        nbr = jnp.zeros(lab.shape, bool)
        for dy, dx in _SHIFTS:
            nbr = nbr | (_shift(lab, dy, dx, 0) > 0)
        frontier = mask & (lab == 0) & nbr
        lvl = jnp.min(jnp.where(frontier, q, big))
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
    max_final_iters: int = 512,
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
