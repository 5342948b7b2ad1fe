"""Pallas connected-components / flood kernels (whole image in VMEM).

The XLA formulations in `cellvit_tpu.ops.cc` stream the full label map
through HBM on every propagation pass (~20 sweeps per associative_scan).
These kernels keep one (H, W) image resident in VMEM (4 MB int32 at 1024²)
and run all propagation locally as **doubling segmented scans**: per
direction, log₂(N) steps of

    v ← b ? v : min(v, roll(v, k));   b ← b | roll(b, k)

where b marks "segment boundary within the last k elements" (background
pixels reset propagation) and rolled-in wraparound counts as a boundary.
Four directions × log₂(N) steps = one full straight-line flood per outer
iteration — everything static full-array vector ops (`pltpu.roll`), no
dynamic slicing, no gathers.

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


def _directional_segmin(v, barrier, axis: int, reverse: bool, size: int):
    """Inclusive segmented min-scan along `axis` via doubling rolls."""
    b = barrier
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    shift = 1
    while shift < size:
        amt = shift if not reverse else size - shift  # roll shifts ≥ 0
        v_s = pltpu.roll(v, amt, axis)
        b_s = pltpu.roll(b, amt, axis)
        if not reverse:
            wrapped = idx < shift
        else:
            wrapped = idx >= size - shift
        v_s = jnp.where(wrapped, INT_MAX, v_s)
        b_s = jnp.where(wrapped, 1, b_s)
        v = jnp.where(b != 0, v, jnp.minimum(v, v_s))
        b = b | b_s
        shift *= 2
    return v


def _propagate(v, fg, h: int, w: int):
    """One full flood pass: 4 directional segmented min-scans + clamp."""
    barrier = (fg == 0).astype(jnp.int32)
    for axis, size in ((0, h), (1, w)):
        for reverse in (False, True):
            v = _directional_segmin(v, barrier, axis, reverse, size)
            v = jnp.where(fg != 0, v, INT_MAX)
    return v


def _cc_kernel(fg_ref, lab_ref, *, n_outer: int):
    h, w = lab_ref.shape[1], lab_ref.shape[2]
    fg = fg_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    v = jnp.where(fg != 0, row * w + col, INT_MAX)

    def outer(_, v):
        return _propagate(v, fg, h, w)

    v = jax.lax.fori_loop(0, n_outer, outer, v)
    lab_ref[0] = jnp.where(fg != 0, v + 1, 0).astype(jnp.int32)


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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(5 * h * w * 4) + 2**21
        ),
        interpret=interpret,
    )(fg.astype(jnp.int32))


def _directional_segor(v, barrier, axis: int, reverse: bool, size: int):
    b = barrier
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    shift = 1
    while shift < size:
        amt = shift if not reverse else size - shift  # roll shifts ≥ 0
        v_s = pltpu.roll(v, amt, axis)
        b_s = pltpu.roll(b, amt, axis)
        if not reverse:
            wrapped = idx < shift
        else:
            wrapped = idx >= size - shift
        v_s = jnp.where(wrapped, 0, v_s)
        b_s = jnp.where(wrapped, 1, b_s)
        v = jnp.where(b != 0, v, v | v_s)
        b = b | b_s
        shift *= 2
    return v


def _flood_kernel(seed_ref, open_ref, out_ref, *, n_outer: int):
    h, w = out_ref.shape[1], out_ref.shape[2]
    open_ = open_ref[0]
    barrier = (open_ == 0).astype(jnp.int32)
    v = seed_ref[0] * open_

    def one_pass(v):
        for axis, size in ((0, h), (1, w)):
            for reverse in (False, True):
                v = _directional_segor(v, barrier, axis, reverse, size)
                v = v * open_
        return v

    v = jax.lax.fori_loop(0, n_outer, lambda _, v: one_pass(v), v)
    out_ref[0] = v.astype(jnp.int32)


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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(5 * h * w * 4) + 2**21
        ),
        interpret=interpret,
    )(seed.astype(jnp.int32), open_.astype(jnp.int32))
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
