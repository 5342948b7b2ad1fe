"""Pallas connected-components / flood kernels (whole image in VMEM).

The XLA formulations in `cellvit_tpu.ops.cc` stream the full label map
through HBM on every propagation pass (~20 sweeps per associative_scan).
These kernels keep one (H, W) image resident in VMEM and run all
propagation locally as **doubling segmented scans**: per direction,
log₂(N) steps of

    v ← b ? v : min(v, roll(v, k));   b ← b | roll(b, k)

where b marks "segment boundary within the last k elements" (background
pixels reset propagation). Rolled-in wraparound is fixed with static strip
stores (no index masks). State lives in the output block + two VMEM
scratch buffers — ~13 MB at 1024², inside the scoped-VMEM budget.

`connected_components_pallas` emits root labels (component-min linear
index + 1, background 0 — matching `cc.connected_components(compact=False)`)
and `flood_pallas` boolean reachability (fill_holes support). `n_outer` is
fixed: each iteration resolves one shape "turn" (nuclei need 2, tissue
backgrounds ~4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = np.iinfo(np.int32).max


def _set_strip(ref, axis: int, start: int, size: int, value):
    if axis == 0:
        ref[start : start + size, :] = jnp.full(
            (size, ref.shape[1]), value, ref.dtype
        )
    else:
        ref[:, start : start + size] = jnp.full(
            (ref.shape[0], size), value, ref.dtype
        )


def _segmin_direction(v_ref, b_ref, t_ref, fg_ref, axis: int, reverse: bool,
                      size: int):
    """In-place segmented min-scan along one direction (doubling rolls)."""
    # (re)initialize the barrier flags from the mask (int8 compares
    # do not lower on Mosaic — go through int32)
    b_ref[...] = 1 - fg_ref[...].astype(jnp.int32)
    shift = 1
    while shift < size:
        amt = shift if not reverse else size - shift
        # rolled values; wrapped strip acts as a barrier with +inf value
        t_ref[...] = pltpu.roll(v_ref[...], amt, axis)
        if not reverse:
            _set_strip(t_ref, axis, 0, shift, INT_MAX)
        else:
            _set_strip(t_ref, axis, size - shift, shift, INT_MAX)
        b = b_ref[...]
        v_ref[...] = jnp.where(
            b != 0, v_ref[...], jnp.minimum(v_ref[...], t_ref[...])
        )
        t_ref[...] = pltpu.roll(b, amt, axis)
        if not reverse:
            _set_strip(t_ref, axis, 0, shift, 1)
        else:
            _set_strip(t_ref, axis, size - shift, shift, 1)
        b_ref[...] = b | t_ref[...]
        shift *= 2


def _cc_kernel(fg_ref, lab_ref, b_ref, t_ref, *, n_outer: int):
    h, w = lab_ref.shape[1], lab_ref.shape[2]
    fg32 = fg_ref[0].astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lab = lab_ref.at[0]
    lab[...] = jnp.where(fg32 != 0, row * w + col, INT_MAX)

    def outer(_, carry):
        for axis, size in ((0, h), (1, w)):
            for reverse in (False, True):
                _segmin_direction(lab, b_ref, t_ref, fg_ref.at[0], axis,
                                  reverse, size)
                lab[...] = jnp.where(fg32 != 0, lab[...], INT_MAX)
        return carry

    jax.lax.fori_loop(0, n_outer, outer, 0)
    lab[...] = jnp.where(fg32 != 0, lab[...] + 1, 0)


@functools.partial(jax.jit, static_argnames=("n_outer", "interpret"))
def connected_components_pallas(
    fg: jnp.ndarray, n_outer: int = 4, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, W) bool → (B, H, W) int32 root labels (min linear index + 1)."""
    b, h, w = fg.shape
    return pl.pallas_call(
        functools.partial(_cc_kernel, n_outer=n_outer),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int32),
            pltpu.VMEM((h, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(fg.astype(jnp.int8))


def _propmin_kernel(seed_ref, fg_ref, out_ref, b_ref, t_ref, *, n_outer: int):
    h, w = out_ref.shape[1], out_ref.shape[2]
    fg32 = fg_ref[0].astype(jnp.int32)
    v = out_ref.at[0]
    v[...] = jnp.where(fg32 != 0, seed_ref[0], INT_MAX)

    def outer(_, carry):
        for axis, size in ((0, h), (1, w)):
            for reverse in (False, True):
                _segmin_direction(v, b_ref, t_ref, fg_ref.at[0], axis,
                                  reverse, size)
                v[...] = jnp.where(fg32 != 0, v[...], INT_MAX)
        return carry

    jax.lax.fori_loop(0, n_outer, outer, 0)


@functools.partial(jax.jit, static_argnames=("n_outer", "interpret"))
def propagate_min_pallas(
    seed: jnp.ndarray, fg: jnp.ndarray, n_outer: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Min-propagate `seed` values over 4-connected foreground components.

    (B, H, W) int32 seed / bool fg → per component, every pixel converges
    to the component's minimum seed (INT_MAX where no finite seed reaches;
    background keeps INT_MAX). Same doubling-scan dynamics as the CC
    kernel, so the same `n_outer` that labels a shape also floods it.
    """
    b, h, w = seed.shape
    return pl.pallas_call(
        functools.partial(_propmin_kernel, n_outer=n_outer),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int32),
            pltpu.VMEM((h, w), jnp.int32),
        ],
        # 40M: at 8×1024² the kernel's measured stack demand is 35.21M
        # (2×-buffered 8M in/out windows + 2M s8 window + 2×4M scratch +
        # spills). The 32M default compiled inside the bench graph but
        # failed inside the two-jit WSI device stage ("allocating on
        # stack for propagate_min_pallas… 35.21M, limit 32.00M" —
        # results/wsi_run.log, round 5); headroom is NOT free to raise
        # further: a 64M experiment on the sibling compact kernel made
        # the demand chase the limit (65.21M > 64M, round-3 ledger).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed.astype(jnp.int32), fg.astype(jnp.int8))


@functools.partial(jax.jit, static_argnames=("n_outer", "interpret"))
def compact_root_labels_pallas(
    lab: jnp.ndarray, n_outer: int = 3, interpret: bool = False
) -> jnp.ndarray:
    """Gather-free label compaction: (B, H, W) root labels (component-min
    linear index + 1, 0 = background) → consecutive 1..N in raster order
    of roots (scipy numbering, identical to `cc.compact_root_labels`).

    The textbook formulation gathers `cumsum(is_root)[lab]` — a 1M-element
    random gather that costs ~66 ms at 8×1024² on TPU (round-3 profiling).
    Here the root's rank is instead min-PROPAGATED across its component
    (each component has exactly one finite seed), which is pure VPU work
    in VMEM — ~3 ms for the same input.
    """
    b, h, w = lab.shape
    n = h * w
    fg = lab > 0
    iota = jnp.arange(n, dtype=jnp.int32).reshape(1, h, w)
    is_root = fg & (lab - 1 == iota)
    new_id = jnp.cumsum(
        is_root.reshape(b, n).astype(jnp.int32), axis=1
    ).reshape(b, h, w)
    seed = jnp.where(is_root, new_id, INT_MAX)
    out = propagate_min_pallas(seed, fg, n_outer=n_outer, interpret=interpret)
    return jnp.where(fg, out, 0)


def _segor_direction(v_ref, b_ref, t_ref, open_ref, axis: int, reverse: bool,
                     size: int):
    b_ref[...] = 1 - open_ref[...].astype(jnp.int32)
    shift = 1
    while shift < size:
        amt = shift if not reverse else size - shift
        t_ref[...] = pltpu.roll(v_ref[...], amt, axis)
        if not reverse:
            _set_strip(t_ref, axis, 0, shift, 0)
        else:
            _set_strip(t_ref, axis, size - shift, shift, 0)
        b = b_ref[...]
        v_ref[...] = jnp.where(b != 0, v_ref[...], v_ref[...] | t_ref[...])
        t_ref[...] = pltpu.roll(b, amt, axis)
        if not reverse:
            _set_strip(t_ref, axis, 0, shift, 1)
        else:
            _set_strip(t_ref, axis, size - shift, shift, 1)
        b_ref[...] = b | t_ref[...]
        shift *= 2


def _flood_kernel(seed_ref, open_ref, out_ref, b_ref, t_ref, *, n_outer: int):
    h, w = out_ref.shape[1], out_ref.shape[2]
    open32 = open_ref[0].astype(jnp.int32)
    v = out_ref.at[0]
    v[...] = seed_ref[0].astype(jnp.int32) * open32

    def outer(_, carry):
        for axis, size in ((0, h), (1, w)):
            for reverse in (False, True):
                _segor_direction(v, b_ref, t_ref, open_ref.at[0], axis,
                                 reverse, size)
                v[...] = v[...] * open32
        return carry

    jax.lax.fori_loop(0, n_outer, outer, 0)


@functools.partial(jax.jit, static_argnames=("n_outer", "interpret"))
def flood_pallas(
    seed: jnp.ndarray, open_: jnp.ndarray, n_outer: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Boolean flood: grow `seed` through `open_` pixels (4-connectivity).
    (B, H, W) bool inputs → (B, H, W) bool reachability."""
    b, h, w = seed.shape
    out = pl.pallas_call(
        functools.partial(_flood_kernel, n_outer=n_outer),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int32),
            pltpu.VMEM((h, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed.astype(jnp.int8), open_.astype(jnp.int8))
    return out != 0


def fill_holes_pallas(
    mask: jnp.ndarray, n_outer: int = 4, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, W) binary_fill_holes via border flood."""
    b, h, w = mask.shape
    bg = ~mask
    border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    seed = jnp.broadcast_to(border, (b, h, w)) & bg
    reach = flood_pallas(seed, bg, n_outer=n_outer, interpret=interpret)
    return mask | (bg & ~reach)


def _rm_small_kernel(lab_ref, out_ref, row_ref, tmp_ref, *, min_size: int):
    """Windowed same-label counting (see cc.remove_small_objects_window for
    the exactness proof). The count accumulates in out_ref; rolls replace
    the unaligned lane-offset slices that made the round-2 attempt
    pathological to compile, and wraparound contamination is masked with
    iota compares instead of strip stores (no extra scratch writes)."""
    h, w = out_ref.shape[1], out_ref.shape[2]
    r = min_size - 1
    lab = lab_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    cnt = out_ref.at[0]
    cnt[...] = jnp.zeros((h, w), jnp.int32)
    for dy in range(-r, r + 1):
        row_ref[...] = pltpu.roll(lab, dy % h, 0)
        rgate = (row >= dy) if dy > 0 else (row < h + dy)
        # -1 sentinel never matches a label (labels are ≥ 0)
        row_ref[...] = jnp.where(rgate, row_ref[...], -1)
        for i, dx in enumerate(range(-r, r + 1)):
            if i == 0:
                tmp_ref[...] = pltpu.roll(row_ref[...], (-r) % w, 1)
            else:
                tmp_ref[...] = pltpu.roll(tmp_ref[...], 1, 1)
            cgate = (col >= dx) if dx > 0 else (col < w + dx)
            cnt[...] = cnt[...] + jnp.where(
                cgate & (tmp_ref[...] == lab), 1, 0
            )
    keep = (lab > 0) & (cnt[...] >= min_size)
    cnt[...] = jnp.where(keep, lab, 0)


@functools.partial(jax.jit, static_argnames=("min_size", "interpret"))
def remove_small_objects_pallas(
    labels: jnp.ndarray, min_size: int, interpret: bool = False
) -> jnp.ndarray:
    """Batched exact small-object removal, whole image in VMEM.

    (B, H, W) int32 labels → components with < min_size pixels zeroed
    (identical to `cc.remove_small_objects_window`, which streams the
    (2·min_size−1)² shifted compares through HBM — ~16 ms per call at
    8×1024²/min_size 10 vs VPU-bound VMEM work here)."""
    if min_size <= 1:
        return labels
    b, h, w = labels.shape
    return pl.pallas_call(
        functools.partial(_rm_small_kernel, min_size=min_size),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int32),
            pltpu.VMEM((h, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(labels.astype(jnp.int32))


def _hist_kernel(lab_ref, hist_ref, *, hi_bins, lo_bins, rows_per_iter):
    """Radix histogram of compacted labels on the MXU, VMEM-resident.

    Per row-group: `hist += onehot(lab÷lo_bins) · onehot(lab mod lo_bins)`
    — 0/1 bf16 one-hots built with iota compares, fp32 accumulation (exact
    counts ≤ 2²⁴). The XLA formulation of the same math materializes the
    (N, bins) one-hots in HBM (~28 ms at 8×1024²); here they live and die
    in VMEM per iteration."""
    h, w = lab_ref.shape[1], lab_ref.shape[2]
    n = rows_per_iter * w

    def body(g, acc):
        rows = lab_ref[0, pl.ds(g * rows_per_iter, rows_per_iter), :]
        flat = rows.reshape(n)
        hi = jnp.clip(flat // lo_bins, 0, hi_bins - 1)
        lo = jnp.clip(flat - hi * lo_bins, 0, lo_bins - 1)
        onehi = (
            jax.lax.broadcasted_iota(jnp.int32, (hi_bins, n), 0)
            == hi[None, :]
        ).astype(jnp.bfloat16)
        onelo = (
            jax.lax.broadcasted_iota(jnp.int32, (n, lo_bins), 1)
            == lo[:, None]
        ).astype(jnp.bfloat16)
        return acc + jnp.dot(onehi, onelo, preferred_element_type=jnp.float32)

    hist_ref[0] = jax.lax.fori_loop(
        0, h // rows_per_iter, body,
        jnp.zeros((hi_bins, lo_bins), jnp.float32),
    )


def _rm_mapback_kernel(
    lab_ref, small_t_ref, out_ref, *, hi_bins, lo_bins, max_labels
):
    """Per-pixel keep decision mapped back through the radix factorization:
    `small(p) = onehot(hi_p) · small · onehot(lo_p)ᵀ` as one (N, lo)·(lo, hi)
    matmul plus a row dot — gather-free."""
    r, w = out_ref.shape[1], out_ref.shape[2]
    n = r * w
    flat = lab_ref[0].reshape(n)
    hi = jnp.clip(flat // lo_bins, 0, hi_bins - 1)
    lo = jnp.clip(flat - hi * lo_bins, 0, lo_bins - 1)
    onelo = (
        jax.lax.broadcasted_iota(jnp.int32, (n, lo_bins), 1) == lo[:, None]
    ).astype(jnp.bfloat16)
    onehi = (
        jax.lax.broadcasted_iota(jnp.int32, (n, hi_bins), 1) == hi[:, None]
    ).astype(jnp.float32)
    back = jnp.dot(onelo, small_t_ref[0], preferred_element_type=jnp.float32)
    small_p = jnp.sum(onehi * back, axis=1)
    keep = (flat > 0) & ((small_p < 0.5) | (flat >= max_labels))
    out_ref[0] = jnp.where(keep, flat, 0).reshape(r, w)


@functools.partial(
    jax.jit, static_argnames=("min_size", "hi_bins", "lo_bins", "interpret")
)
def remove_small_objects_bincount_pallas(
    labels: jnp.ndarray,
    min_size: int,
    hi_bins: int = 64,
    lo_bins: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched `remove_small_objects` for COMPACTED labels via an MXU radix
    histogram (two Pallas kernels: size counting + keep map-back).

    Exact for ids < hi_bins·lo_bins (8192); beyond that, bin counts only
    inflate, so degradation is conservative (a small component can be kept,
    never removed in error) and overflow ids are always kept — see
    `cc.remove_small_objects_bincount` (the HBM-bound XLA formulation of
    the same math) for the semantics and proof sketch.

    MEASURED AND REJECTED for the 8×1024² pipeline (round 3): 36.7 ms vs
    16.4 for `cc.remove_small_objects_window` — the per-iteration
    (64, 8192)×(8192, 128) matmuls pay Mosaic relayouts that outweigh the
    HBM savings. Kept (exactness-tested) for large-min_size regimes.

    Reference semantics: skimage `remove_small_objects(min_size)`
    (post_proc_cellvit.py:190,214)."""
    if min_size <= 1:
        return labels
    b, h, w = labels.shape
    labels = labels.astype(jnp.int32)
    max_labels = hi_bins * lo_bins
    hist = pl.pallas_call(
        functools.partial(
            _hist_kernel, hi_bins=hi_bins, lo_bins=lo_bins, rows_per_iter=8
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, hi_bins, lo_bins), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hi_bins, lo_bins), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(labels)
    small_t = jnp.swapaxes(hist < min_size, 1, 2).astype(jnp.bfloat16)
    rows = 8
    return pl.pallas_call(
        functools.partial(
            _rm_mapback_kernel,
            hi_bins=hi_bins, lo_bins=lo_bins, max_labels=max_labels,
        ),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, rows, w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lo_bins, hi_bins), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(labels, small_t)


_WS_INF = np.int32(2**30)


def _ws_adopt(lab, q_ref, mask32, bl_ref, bq_ref, t_ref, active, h, w):
    """One adoption pass: unlabeled active pixels take the label of the
    labeled 4-neighbor with minimal quantized height (tie order N, S, W, E
    — matches ops/watershed.py:_adopt). Returns whether anything changed."""
    bl_ref[...] = jnp.zeros((h, w), jnp.int32)
    bq_ref[...] = jnp.full((h, w), _WS_INF, jnp.int32)
    for axis, reverse in ((0, False), (0, True), (1, False), (1, True)):
        size = h if axis == 0 else w
        amt = 1 if not reverse else size - 1
        t_ref[...] = pltpu.roll(lab[...], amt, axis)
        _set_strip(t_ref, axis, 0 if not reverse else size - 1, 1, 0)
        nb_lab = t_ref[...]
        t_ref[...] = pltpu.roll(q_ref[0], amt, axis)
        _set_strip(t_ref, axis, 0 if not reverse else size - 1, 1, _WS_INF)
        nb_q = t_ref[...]
        better = (nb_lab > 0) & (nb_q < bq_ref[...])
        bl_ref[...] = jnp.where(better, nb_lab, bl_ref[...])
        bq_ref[...] = jnp.where(better, nb_q, bq_ref[...])
    cur = lab[...]
    take = (active != 0) & (cur == 0) & (bl_ref[...] > 0)
    new = jnp.where(take, bl_ref[...], cur)
    lab[...] = new
    return jnp.any(new != cur)


def _watershed_kernel(
    q_ref, mask_ref, marker_ref, lab_ref, bl_ref, bq_ref, t_ref,
    *, levels: int, inner_iters: int, max_final_iters: int,
):
    h, w = lab_ref.shape[1], lab_ref.shape[2]
    lab = lab_ref.at[0]
    mask32 = mask_ref[0].astype(jnp.int32)
    lab[...] = jnp.where(mask32 != 0, marker_ref[0], 0)

    def level_body(lvl, carry):
        active = jnp.where((mask32 != 0) & (q_ref[0] <= lvl), 1, 0)

        def inner(_, c):
            _ws_adopt(lab, q_ref, mask32, bl_ref, bq_ref, t_ref, active, h, w)
            return c

        return jax.lax.fori_loop(0, inner_iters, inner, carry)

    jax.lax.fori_loop(0, levels, level_body, 0)

    # stabilization until no change (same condition as the XLA version)
    def cond(state):
        it, changed = state
        return jnp.logical_and(changed, it < max_final_iters)

    def body(state):
        it, _ = state
        ch = _ws_adopt(lab, q_ref, mask32, bl_ref, bq_ref, t_ref, mask32, h, w)
        return it + 1, ch

    jax.lax.while_loop(cond, body, (0, True))


@functools.partial(
    jax.jit,
    static_argnames=("levels", "inner_iters", "max_final_iters", "interpret"),
)
def watershed_pallas(
    image: jnp.ndarray,
    markers: jnp.ndarray,
    mask: jnp.ndarray,
    levels: int = 64,
    inner_iters: int = 4,
    max_final_iters: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched quantized-level-flood watershed, whole image in VMEM.

    Same algorithm and adoption order as `ops.watershed.watershed` (the
    XLA version spends ~5× longer re-materializing padded neighbor maps in
    HBM per pass); inputs (B, H, W): image f32 relief, markers int32,
    mask bool. Returns int32 labels.
    """
    b, h, w = image.shape
    neg = jnp.where(mask, image, jnp.inf)
    lo = jnp.min(neg, axis=(1, 2), keepdims=True)
    hi = jnp.max(jnp.where(mask, image, -jnp.inf), axis=(1, 2), keepdims=True)
    rng = jnp.where(hi > lo, hi - lo, 1.0)
    q = jnp.clip((image - lo) / rng * (levels - 1), 0, levels - 1).astype(
        jnp.int32
    )
    return pl.pallas_call(
        functools.partial(
            _watershed_kernel, levels=levels, inner_iters=inner_iters,
            max_final_iters=max_final_iters,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int32),
            pltpu.VMEM((h, w), jnp.int32),
            pltpu.VMEM((h, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, mask.astype(jnp.int8), markers.astype(jnp.int32))
