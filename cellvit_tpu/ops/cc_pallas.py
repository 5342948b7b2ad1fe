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
