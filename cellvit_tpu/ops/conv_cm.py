"""Channel-major 3x3 convolution Pallas kernel for lane-starved stages.

Why: the decoder d0 stages (3x3, 64->64 at 1024^2 — reference
`models/segmentation/cell_segmentation/cellvit.py` Conv2DBlock towers)
run at ~45 TF/s under XLA because BOTH matmul dimensions underfill the
MXU: the contraction is only C=64 deep (half a 128-tile) and the output
is only F=64 wide (half the lanes). This kernel transposes the problem:
with channels major, spatial positions occupy the 128 lanes (always
full) and an in-VMEM im2col panel makes the contraction 9*C=576 deep.
The only extra cost is the VPU panel build (9 shifted row copies), ~25%
of the matmul cycles at balance.

Layout: input/output are channel-major (B, C, H, W) — "CM". Hot callers
keep activations CM across consecutive convs; `nhwc_to_cm`/`cm_to_nhwc`
are plain XLA transposes for the boundaries.

STATUS — measured and REJECTED for the d0 decoder stage (round 3, one
v5e chip, 8x64x1024x1024 -> 64, bf16, chained dispatch): XLA conv+relu
15.7 ms vs this kernel 24.7 ms (22.7/conv in a 2-chain; +res epilogue
26.5; the 64->192 variant exceeds the 16 MB scoped-VMEM stack). The
in-kernel panel build (48 lane-rotates + 72 row copies per block) is
VPU work XLA's native conv lowering doesn't pay, and F=64 underfills
the MXU output-rows dim in ANY layout, so the lane-side win cannot
recoup it. Kept with exactness tests as a building block for shapes
where a fused epilogue outweighs panel cost (deep C, small H*W).

Halo handling: the grid walks row-blocks; three BlockSpec views of the
same input (prev/cur/next row-block, edge-clamped) provide the +-1 rows
without overlapping blocks. Row/column image edges are zeroed to match
SAME zero padding. All slices are static (the row loop is a Python
range) — no value dynamic_slice, per Mosaic limits; column shifts use
pltpu.roll with an iota edge mask.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def nhwc_to_cm(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, H, W)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def cm_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def pack_kernel_cm(w: jnp.ndarray) -> jnp.ndarray:
    """HWIO (3, 3, C, F) conv kernel -> (F, 9C) matmul weights.

    Row layout matches the im2col panel: tap (dy, dx) occupies rows
    [(3*dy + dx)*C, (3*dy + dx + 1)*C).
    """
    kh, kw, c, f = w.shape
    assert kh == 3 and kw == 3, "3x3 only"
    return jnp.transpose(w, (3, 0, 1, 2)).reshape(f, 9 * c)


def _roll_lanes(row: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Lane rotate that Mosaic can lower for any dtype.

    `tpu.dynamic_rotate` is only implemented for 32-bit element types
    ("Rotate with non-32-bit data" compile error on bf16), so narrow
    dtypes round-trip through fp32 for the rotate.
    """
    if row.dtype.itemsize == 4:
        return pltpu.roll(row, shift, 1)
    return pltpu.roll(row.astype(jnp.float32), shift, 1).astype(row.dtype)


def _conv3x3_kernel(
    xprev_ref,
    xcur_ref,
    xnext_ref,
    w_ref,
    b_ref,
    *rest,
    rows: int,
    n_blocks: int,
    relu: bool,
    has_res: bool,
    out_dtype,
):
    if has_res:
        res_ref, out_ref, a_ref = rest
    else:
        res_ref = None
        out_ref, a_ref = rest
    i = pl.program_id(1)
    c = xcur_ref.shape[1]
    w = xcur_ref.shape[3]
    col = jax.lax.broadcasted_iota(jnp.int32, (c, w), 1)
    zero_row = jnp.zeros((c, w), xcur_ref.dtype)

    def src_row(g: int):
        # Global row offset g in [-1, rows] relative to this block; static.
        if g == -1:
            row = xprev_ref[0, :, rows - 1, :]
            return jnp.where(i > 0, row, zero_row)
        if g == rows:
            row = xnext_ref[0, :, 0, :]
            return jnp.where(i < n_blocks - 1, row, zero_row)
        return xcur_ref[0, :, g, :]

    for r in range(rows):
        for dy in (-1, 0, 1):
            row = src_row(r + dy)
            for dx in (-1, 0, 1):
                if dx == 0:
                    sh = row
                elif dx == 1:
                    # out col j takes input col j+1; zero the last column
                    # (pltpu.roll takes non-negative shifts: -1 == w-1)
                    sh = jnp.where(col < w - 1, _roll_lanes(row, w - 1), 0)
                else:
                    sh = jnp.where(col > 0, _roll_lanes(row, 1), 0)
                k = (dy + 1) * 3 + (dx + 1)
                a_ref[k * c:(k + 1) * c, :] = sh
        acc = jax.lax.dot_general(
            w_ref[...],
            a_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + b_ref[...]
        if has_res:
            acc = acc + res_ref[0, :, r, :].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, :, r, :] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("rows", "relu", "res_block", "interpret")
)
def conv3x3_cm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    rows: int = 8,
    relu: bool = False,
    res: Optional[jnp.ndarray] = None,
    res_block: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME 3x3 convolution on a channel-major (B, C, H, W) tensor.

    Args:
        x: (B, C, H, W) input, C a multiple of 8, W a multiple of 128.
        w: HWIO (3, 3, C, F) kernel (torch/flax layout after transpose).
        b: optional (F,) bias, added pre-activation.
        rows: row-block height (H % rows == 0).
        relu: fuse max(x, 0) into the epilogue.
        res: optional (B, kF, H, W) residual added pre-activation (after
            bias) — fuses e.g. a shared-conv slice into the epilogue with
            no extra HBM round-trip. Channels [res_block*F, (res_block+1)*F)
            are used, so a merged multi-tower buffer can be passed whole
            (no slice materialization).
        res_block: which F-sized channel block of `res` to add.

    Returns (B, F, H, W) in x.dtype.
    """
    bsz, c, h, wd = x.shape
    f = w.shape[-1]
    assert h % rows == 0, (h, rows)
    n_blocks = h // rows
    wm = pack_kernel_cm(w.astype(x.dtype))
    bias = jnp.zeros((f, 1), jnp.float32) if b is None else (
        b.astype(jnp.float32).reshape(f, 1)
    )

    blk = lambda fn: pl.BlockSpec((1, c, rows, wd), fn)
    in_specs = [
        blk(lambda bi, ri: (bi, 0, jnp.maximum(ri - 1, 0), 0)),
        blk(lambda bi, ri: (bi, 0, ri, 0)),
        blk(lambda bi, ri: (bi, 0, jnp.minimum(ri + 1, n_blocks - 1), 0)),
        pl.BlockSpec((f, 9 * c), lambda bi, ri: (0, 0)),
        pl.BlockSpec((f, 1), lambda bi, ri: (0, 0)),
    ]
    inputs = [x, x, x, wm, bias]
    if res is not None:
        assert res.shape[0] == bsz and res.shape[2:] == (h, wd), res.shape
        assert res.shape[1] % f == 0 and res_block < res.shape[1] // f, (
            res.shape, f, res_block)
        in_specs.append(
            pl.BlockSpec(
                (1, f, rows, wd),
                lambda bi, ri, rb=res_block: (bi, rb, ri, 0),
            )
        )
        inputs.append(res)
    return pl.pallas_call(
        functools.partial(
            _conv3x3_kernel,
            rows=rows,
            n_blocks=n_blocks,
            relu=relu,
            has_res=res is not None,
            out_dtype=x.dtype,
        ),
        grid=(bsz, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, f, rows, wd), lambda bi, ri: (bi, 0, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, f, h, wd), x.dtype),
        scratch_shapes=[pltpu.VMEM((9 * c, wd), x.dtype)],
        interpret=interpret,
    )(*inputs)


def conv3x3_cm_reference(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
    relu: bool = False, res: Optional[jnp.ndarray] = None,
    res_block: int = 0,
) -> jnp.ndarray:
    """XLA oracle with identical semantics (CM in/out)."""
    out = jax.lax.conv_general_dilated(
        cm_to_nhwc(x),
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    if res is not None:
        f = w.shape[-1]
        sl = res[:, res_block * f : (res_block + 1) * f]
        out = out + cm_to_nhwc(sl).astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return nhwc_to_cm(out.astype(x.dtype))


def conv_t2x2_cm(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, dtype
) -> jnp.ndarray:
    """ConvTranspose 2x2/stride-2 on NHWC input, channel-major output.

    Same depth-to-space matmul as `models/fused.py:_conv_t2x2` but the
    6-D transpose lands the result directly in (B, F, 2H, 2W) layout, so
    a CM consumer (conv3x3_cm) needs no extra transpose.
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    wmat = kernel.astype(dtype).reshape(c, 4 * f)
    y = jnp.matmul(
        x.astype(dtype).reshape(b * h * w, c), wmat,
        preferred_element_type=dtype,
    ).reshape(b, h, w, 2, 2, f)
    y = y.transpose(0, 5, 1, 3, 2, 4).reshape(b, f, 2 * h, 2 * w)
    return y + bias.astype(dtype)[None, :, None, None]
