"""Separable image filters as banded-matrix matmuls (MXU-friendly).

cv2-compatible Sobel/Gaussian filtering for the HV postprocessing pipeline
(reference `post_proc_cellvit.py:185-235` uses cv2.Sobel ksize 21/11 and
cv2.GaussianBlur 3×3). On TPU we express a 1-D convolution along rows or
columns as a dense (N, N) banded matrix with the REFLECT_101 border folded
in; filtering a (B, H, W) stack is then two large matmuls that tile straight
onto the MXU — no gather/scatter, no halo exchanges.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def binomial_row(order: int) -> np.ndarray:
    """Pascal-triangle row: coefficients of (1+x)**order."""
    row = np.array([1.0])
    for _ in range(order):
        row = np.convolve(row, [1.0, 1.0])
    return row


def sobel_kernels_1d(ksize: int) -> Tuple[np.ndarray, np.ndarray]:
    """(derivative, smoothing) 1-D kernels matching cv2.getDerivKernels(1, 0,
    ksize): smooth = binomial(ksize-1), deriv = binomial(ksize-3) ⊛ [-1,0,1]
    (correlation layout: positive gradient along +axis)."""
    smooth = binomial_row(ksize - 1)
    deriv = np.convolve(binomial_row(ksize - 3), [1.0, 0.0, -1.0])[::-1]
    return deriv, smooth


GAUSS_3 = np.array([0.25, 0.5, 0.25])  # cv2.getGaussianKernel(3, 0)


def _reflect101(j: int, n: int) -> int:
    while j < 0 or j >= n:
        if j < 0:
            j = -j
        if j >= n:
            j = 2 * (n - 1) - j
    return j


@lru_cache(maxsize=64)
def band_matrix(n: int, kernel: Tuple[float, ...]) -> np.ndarray:
    """(n, n) operator M with y = M @ x equal to correlation of x with
    `kernel` under BORDER_REFLECT_101 (cv2 default)."""
    k = np.asarray(kernel, dtype=np.float64)
    r = len(k) // 2
    m = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for t, kv in enumerate(k):
            m[i, _reflect101(i + t - r, n)] += kv
    return m.astype(np.float32)


def _correlate_1d(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """Correlate (…, H, W) along `axis` (-1 or -2) with REFLECT_101 border.

    Implemented as a 1-D `lax.conv_general_dilated` over the reflect-padded
    axis — true O(k·N) work (the banded-matrix matmul variant costs k×
    extra FLOPs at 1024², dominating postprocessing time).
    """
    import jax

    k = jnp.asarray(kernel, jnp.float32)
    r = len(kernel) // 2
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(-1, h, w)
    if axis == -1:
        pad = [(0, 0), (0, 0), (r, r)]
        xp = jnp.pad(xf, pad, mode="reflect")
        lhs = xp.reshape(-1, xp.shape[-1], 1)  # (B·H, Wp, C=1)
        rhs = k.reshape(-1, 1, 1)  # (k, in=1, out=1)
        out = jax.lax.conv_general_dilated(
            lhs, rhs, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
        )
        return out.reshape(*lead, h, w)
    xp = jnp.pad(xf, [(0, 0), (r, r), (0, 0)], mode="reflect")
    lhs = xp.transpose(0, 2, 1).reshape(-1, xp.shape[-2], 1)  # (B·W, Hp, 1)
    rhs = k.reshape(-1, 1, 1)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
    )
    return out.reshape(-1, w, h).transpose(0, 2, 1).reshape(*lead, h, w)


def filter_rows(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Correlate along the last axis (W) of (..., H, W)."""
    return _correlate_1d(x, kernel, axis=-1)


def filter_cols(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Correlate along the second-to-last axis (H) of (..., H, W)."""
    return _correlate_1d(x, kernel, axis=-2)


def sobel(x: jnp.ndarray, dx: int, dy: int, ksize: int) -> jnp.ndarray:
    """cv2.Sobel(x, CV_64F|CV_32F, dx, dy, ksize) for (…, H, W) inputs,
    dx+dy == 1."""
    deriv, smooth = sobel_kernels_1d(ksize)
    if dx == 1:
        return filter_cols(filter_rows(x, deriv), smooth)
    return filter_rows(filter_cols(x, deriv), smooth)


def gaussian_blur_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.GaussianBlur(x, (3, 3), 0) for (…, H, W) inputs."""
    return filter_cols(filter_rows(x, GAUSS_3), GAUSS_3)


def minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.normalize(NORM_MINMAX, 0, 1) over the trailing two axes."""
    lo = jnp.min(x, axis=(-2, -1), keepdims=True)
    hi = jnp.max(x, axis=(-2, -1), keepdims=True)
    rng = hi - lo
    return jnp.where(rng > 0, (x - lo) / jnp.where(rng > 0, rng, 1.0), 0.0)
