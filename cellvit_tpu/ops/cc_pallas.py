"""Pallas connected-components / flood kernels (whole image in VMEM).

The XLA formulations in `cellvit_tpu.ops.cc` stream the full label map
through HBM on every propagation pass (~20 sweeps per associative_scan).
These kernels instead keep one (H, W) image resident in VMEM (4 MB int32 at
1024², within the ~16 MB budget) and run all propagation sweeps locally:

* one outer iteration = down + up raster sweeps (sequential row recurrence
  over VMEM refs — full vertical flood), a VMEM transpose, down + up again
  (horizontal flood), transpose back;
* `n_outer` is fixed (no convergence check): each iteration resolves one
  "turn" of a component's shape; nuclei need 2, tissue backgrounds ~4.

`connected_components_pallas` emits root labels (component-min linear
index + 1, background 0 — same as `cc.connected_components(compact=False)`)
and `flood_pallas` boolean border-reachability (fill_holes support).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = np.iinfo(np.int32).max


def _sweep_rows_min(buf_ref, fg_ref, h: int):
    """In-place down+up raster sweeps on (H, W) VMEM refs: row recurrence
    new[i] = fg[i] ? min(buf[i], fg[i±1] ? buf[i±1] : INT_MAX) : INT_MAX."""

    def down(i, _):
        prev = buf_ref[pl.ds(i - 1, 1), :]
        fprev = fg_ref[pl.ds(i - 1, 1), :]
        cur = buf_ref[pl.ds(i, 1), :]
        fcur = fg_ref[pl.ds(i, 1), :]
        cand = jnp.where(fprev != 0, prev, INT_MAX)
        buf_ref[pl.ds(i, 1), :] = jnp.where(
            fcur != 0, jnp.minimum(cur, cand), INT_MAX
        )
        return 0

    def up(j, _):
        i = h - 2 - j
        nxt = buf_ref[pl.ds(i + 1, 1), :]
        fnxt = fg_ref[pl.ds(i + 1, 1), :]
        cur = buf_ref[pl.ds(i, 1), :]
        fcur = fg_ref[pl.ds(i, 1), :]
        cand = jnp.where(fnxt != 0, nxt, INT_MAX)
        buf_ref[pl.ds(i, 1), :] = jnp.where(
            fcur != 0, jnp.minimum(cur, cand), INT_MAX
        )
        return 0

    jax.lax.fori_loop(1, h, down, 0)
    jax.lax.fori_loop(0, h - 1, up, 0)


def _cc_kernel(fg_ref, lab_ref, buf_ref, fgt_ref, buft_ref, *, n_outer: int):
    h, w = lab_ref.shape[1], lab_ref.shape[2]
    fg = fg_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    buf_ref[...] = jnp.where(fg != 0, row * w + col, INT_MAX)
    fgt_ref[...] = fg.T

    def outer(_, carry):
        _sweep_rows_min(buf_ref, fg_ref.at[0], h)
        buft_ref[...] = buf_ref[...].T
        _sweep_rows_min(buft_ref, fgt_ref, w)
        buf_ref[...] = buft_ref[...].T
        return carry

    jax.lax.fori_loop(0, n_outer, outer, 0)
    lab_ref[0] = jnp.where(fg != 0, buf_ref[...] + 1, 0).astype(jnp.int32)


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
            pltpu.VMEM((w, h), jnp.int8),
            pltpu.VMEM((w, h), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(2.5 * (2 * h * w * 4 + 2 * h * w)) + 2**21
        ),
        interpret=interpret,
    )(fg.astype(jnp.int8))


def _sweep_rows_or(buf_ref, open_ref, h: int):
    def down(i, _):
        prev = buf_ref[pl.ds(i - 1, 1), :]
        cur = buf_ref[pl.ds(i, 1), :]
        op = open_ref[pl.ds(i, 1), :]
        buf_ref[pl.ds(i, 1), :] = jnp.where(op != 0, cur | prev, 0)
        return 0

    def up(j, _):
        i = h - 2 - j
        nxt = buf_ref[pl.ds(i + 1, 1), :]
        cur = buf_ref[pl.ds(i, 1), :]
        op = open_ref[pl.ds(i, 1), :]
        buf_ref[pl.ds(i, 1), :] = jnp.where(op != 0, cur | nxt, 0)
        return 0

    jax.lax.fori_loop(1, h, down, 0)
    jax.lax.fori_loop(0, h - 1, up, 0)


def _flood_kernel(seed_ref, open_ref, out_ref, buf_ref, opent_ref, buft_ref,
                  *, n_outer: int):
    h, w = out_ref.shape[1], out_ref.shape[2]
    buf_ref[...] = (seed_ref[0] != 0).astype(jnp.int8) * (
        open_ref[0] != 0
    ).astype(jnp.int8)
    opent_ref[...] = open_ref[0].T

    def outer(_, carry):
        _sweep_rows_or(buf_ref, open_ref.at[0], h)
        buft_ref[...] = buf_ref[...].T
        _sweep_rows_or(buft_ref, opent_ref, w)
        buf_ref[...] = buft_ref[...].T
        return carry

    jax.lax.fori_loop(0, n_outer, outer, 0)
    out_ref[0] = buf_ref[...]


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
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int8),
            pltpu.VMEM((w, h), jnp.int8),
            pltpu.VMEM((w, h), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=8 * h * w + 2**21
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
