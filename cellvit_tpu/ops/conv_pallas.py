"""Pallas TPU kernels for the decoder's stride-1 3×3 convolutions.

XLA's conv lowering runs the 1024² decoder convs at 14-25 TF/s on v5e
(measured; see CLAUDE.md perf ledger). This kernel streams row blocks of
the pre-padded NHWC input through VMEM and issues the nine tap matmuls on
the MXU directly — with channels on lanes there are no lane shifts, only
static sublane offsets 0..2, which Mosaic compiles cleanly (unlike the
361-offset windowed variant rejected earlier).

An optional fused epilogue applies folded BatchNorm (scale/shift) and ReLU,
so an inference ConvBNRelu block becomes ONE kernel with no intermediate
HBM round-trip. Training keeps the XLA path (live batch stats, autodiff).

Reference counterpart: torch `Conv2d(k=3, s=1, p=1)` in
`models/segmentation/cell_segmentation/utils.py:11-86`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    x_hbm, w_ref, sc_ref, sh_ref, o_ref, xs, sem, *, block_h, width, relu
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * block_h, block_h + 2)], xs, sem
    )
    cp.start()
    cp.wait()
    c = xs.shape[-1]
    f = w_ref.shape[-1]
    acc = jnp.zeros((block_h * width, f), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = xs[dy : dy + block_h, dx : dx + width, :].reshape(
                block_h * width, c
            )
            acc = acc + jnp.dot(
                sl, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    y = acc * sc_ref[0] + sh_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.reshape(block_h, width, f).astype(o_ref.dtype)


def conv3x3_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    relu: bool = False,
    block_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME 3×3 conv, NHWC, with optional fused scale/shift/ReLU.

    Args:
        x: (B, H, W, C); H must be divisible by block_h.
        w: (3, 3, C, F) HWIO kernel.
        scale/shift: (F,) folded-BN affine (y = conv·scale + shift);
            defaults to identity (shift doubles as the conv bias).
        relu: fuse max(y, 0).
    Returns:
        (B, H, W, F) in x.dtype (fp32 accumulation throughout).
    """
    b, h, width, c = x.shape
    f = w.shape[-1]
    assert h % block_h == 0, (h, block_h)
    if scale is None:
        scale = jnp.ones((f,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((f,), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid = (b, h // block_h)
    kernel = partial(_conv_kernel, block_h=block_h, width=width, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3, 3, c, f), lambda bi, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, f), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, f), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_h, width, f), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, width, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_h + 2, width + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w.astype(x.dtype), scale.reshape(1, f), shift.reshape(1, f))
