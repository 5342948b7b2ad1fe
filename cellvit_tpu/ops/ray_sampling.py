"""Ray-wise feature sampling for CPP-Net refinement (jit-compatible).

Reimplements the reference's `feature_sampling`/`SamplingFeatures`
(`cellvit_cpp_net.py:25-164`, torch F.grid_sample nearest,
align_corners=False) as a channel-last JAX gather: for each ray k, sample
feature channel k at position (x + cos θ_k · d, y + sin θ_k · d). The exact
normalize→denormalize chain of the reference (divide by (W-1), map to
[-1, 1], grid_sample's align_corners=False pixel mapping) collapses to
`px · W/(W-1) − 0.5`, reproduced here including the zero padding for
out-of-bounds samples.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def ray_angles(n_rays: int) -> np.ndarray:
    return np.arange(n_rays, dtype=np.float32) / n_rays * 2.0 * np.pi


def sample_rays(features: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Per-ray nearest-neighbor sampling.

    Args:
        features: (B, H, W, K) — channel k belongs to ray k.
        dist: (B, H, W, K) radial offsets along each ray.
    Returns:
        (B, H, W, K) sampled values (0 outside the image).
    """
    b, h, w, k = features.shape
    angles = ray_angles(k)
    cos = jnp.asarray(np.cos(angles))[None, None, None, :]
    sin = jnp.asarray(np.sin(angles))[None, None, None, :]
    xx = jax.lax.broadcasted_iota(jnp.float32, (1, h, w, 1), 2)
    yy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w, 1), 1)
    px = xx + cos * dist  # sample x position per ray
    py = yy + sin * dist
    # torch-exact chain: normalize to [-1, 1] (reference divides by N-1),
    # then grid_sample's align_corners=False unnormalize, then
    # round-half-even (std::nearbyint) — f32 tie behavior at -0.5 matters
    gx = (px / (w - 1)) * 2.0 - 1.0
    gy = (py / (h - 1)) * 2.0 - 1.0
    sx = ((gx + 1.0) * w - 1.0) / 2.0
    sy = ((gy + 1.0) * h - 1.0) / 2.0
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)

    def gather_one(feat, yi, xi):
        # feat (H, W, K); yi/xi (H, W, K)
        ks = jax.lax.broadcasted_iota(jnp.int32, yi.shape, 2)
        return feat[yi, xi, ks]

    sampled = jax.vmap(gather_one)(features, yi, xi)
    return jnp.where(valid, sampled, 0.0)
