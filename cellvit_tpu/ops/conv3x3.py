"""Stride-1 3×3 SAME convolution as 9 shifted matmuls.

XLA's native conv lowering on TPU runs the decoder's high-resolution
stride-1 3×3 convs at 10-20 TF/s (5-10% of v5e bf16 peak; measured at
8×1024²×128→64). Expressing the same conv as

    y = Σ_{dy,dx} shift(x, dy, dx) @ W[dy, dx]

turns it into nine (B·H·W, C)×(C, F) contractions the MXU tiles natively,
with the shifted reads fused into the dot operands. Numerics match
`lax.conv_general_dilated` with fp32 accumulation (each tap accumulates in
fp32; the sum of taps stays fp32 until the final cast).

Autodiff works through the einsums (the transpose of a shifted matmul is a
shifted matmul), so this is train-safe. Used by the decoder blocks in
`models/layers.py`; parity vs `nn.Conv` covered in tests/test_conv3x3.py.

Reference counterpart: torch `nn.Conv2d(k=3, s=1, p=1)` inside
`models/segmentation/cell_segmentation/utils.py:11-86` (Conv2DBlock /
Deconv2DBlock towers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv3x3_mm(
    x: jnp.ndarray, w: jnp.ndarray, compute_dtype=None
) -> jnp.ndarray:
    """3×3 stride-1 SAME conv, NHWC, as nine shifted matmuls.

    Args:
        x: (B, H, W, C) input.
        w: (3, 3, C, F) kernel (HWIO, same as flax `nn.Conv`).
        compute_dtype: dtype for the matmul inputs (defaults to x.dtype).
    Returns:
        (B, H, W, F) in compute_dtype (accumulated in fp32).
    """
    b, h, wdt, c = x.shape
    f = w.shape[-1]
    dt = compute_dtype or x.dtype
    x = x.astype(dt)
    w = w.astype(dt)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = lax.slice(
                xp, (0, dy, dx, 0), (b, dy + h, dx + wdt, c)
            )
            t = jnp.einsum(
                "bhwc,cf->bhwf", xs, w[dy, dx],
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    return acc.astype(dt)
