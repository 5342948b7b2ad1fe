"""Shared NN building blocks (flax.linen, NHWC, MXU-friendly).

Functional equivalents of the blocks used by the reference CellViT decoders
(`models/segmentation/cell_segmentation/utils.py:11-86` — Conv→BN→ReLU blocks
and ConvTranspose 2×2/s2 deconv blocks), redesigned for TPU:

* 2×2-stride-2 transposed convolutions are expressed as a single einsum
  (a (BHW, C)×(C, 4F) matmul on the MXU) followed by a reshape — no
  `conv_transpose` scatter, no padding arithmetic.
* 16×16-stride-16 patch embedding is a space-to-depth reshape + Dense matmul.
* All blocks take a `dtype` for bf16 compute with f32 params.

Parameter shapes are chosen so that reference torch checkpoints map with a
pure transpose (see `cellvit_tpu.models.checkpoint_io`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.init defaults are irrelevant once checkpoints are loaded; for
# from-scratch training we follow the reference's trunc_normal(0.02) scheme.
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class ConvBNRelu(nn.Module):
    """Conv(k, SAME) → BatchNorm → ReLU (+dropout).

    Mirrors the reference `Conv2DBlock` (utils.py:11-43): torch uses explicit
    padding (k-1)//2 which equals SAME for stride-1 odd kernels. BN eps 1e-5,
    momentum 0.1 (torch) == flax momentum 0.9.
    """

    features: int
    kernel_size: int = 3
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        x = nn.relu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ConvTranspose2x2(nn.Module):
    """2×2-kernel, stride-2 transposed convolution as einsum + reshape.

    out[b, 2h+p, 2w+q, f] = Σ_c x[b, h, w, c] · W[c, p, q, f] + bias[f]

    Exactly the semantics of torch `ConvTranspose2d(k=2, s=2, p=0)` whose
    weight has shape (C_in, C_out, 2, 2); the converter transposes it to
    (C_in, 2, 2, C_out). Expressed this way the op is a plain matmul over the
    channel axis — it tiles straight onto the MXU instead of a strided
    scatter.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        f = self.features
        kernel = self.param(
            "kernel", trunc_normal_init, (c, 2, 2, f), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        # depth-to-space form: one (B·H·W, C)×(C, 4F) matmul, then an
        # explicit interleave transpose. Measured 4.6 vs 7.2 ms for the
        # einsum→bhpwqf reshape at 8×512²×128→64 on v5e (the fused-interleave
        # reshape forces a worse layout than transpose-of-6D).
        wmat = kernel.astype(self.dtype).reshape(c, 4 * f)
        y = jnp.matmul(
            x.astype(self.dtype).reshape(b * h * w, c), wmat,
            preferred_element_type=self.dtype,
        ).reshape(b, h, w, 2, 2, f)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, f)
        return y + bias.astype(self.dtype)


class DeconvBlock(nn.Module):
    """ConvTranspose2x2 → Conv(k) → BN → ReLU (+dropout).

    Mirrors the reference `Deconv2DBlock` (utils.py:46-86).
    """

    features: int
    kernel_size: int = 3
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = ConvTranspose2x2(self.features, dtype=self.dtype, name="deconv")(x)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        x = nn.relu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class PatchEmbed(nn.Module):
    """16×16/s16 patch embedding as space-to-depth + Dense.

    Equivalent to the reference's Conv2d(k=16, s=16) patch projection
    (`vits_histo.py:250-280`, `SAM/image_encoder.py:395-426`) but implemented
    as a reshape + matmul: a (B·Ht·Wt, 16·16·3)×(768, E) contraction the MXU
    tiles natively. Returns (B, Ht, Wt, E).
    """

    embed_dim: int
    patch_size: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        p = self.patch_size
        ht, wt = h // p, w // p
        # (B, Ht, p, Wt, p, C) -> (B, Ht, Wt, p, p, C) -> (B, Ht, Wt, p*p*C)
        x = x.reshape(b, ht, p, wt, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, ht, wt, p * p * c)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)
        return x


class Mlp(nn.Module):
    """Transformer MLP with exact-erf GELU (torch nn.GELU default)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        # keep the erf-gelu OUT of the fc2 matmul prologue: XLA otherwise
        # fuses it into the dot and the MXU runs at half rate (SAM-H fc2
        # profiled 4.75 ms ≈ 90 TF/s fused vs fc1's 2.26 ≈ 190 TF/s; the
        # barrier trades that for one HBM round-trip of the hidden tensor)
        x = jax.lax.optimization_barrier(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def drop_path(
    x: jax.Array, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jax.Array:
    """Stochastic depth: drop the residual branch per-sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature axis with biased variance.

    Matches the SAM neck's LayerNorm2d (`SAM/utils.py`): normalizes over the
    channel dim only, eps 1e-6.
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def resize_matrix_1d(
    n_in: int, n_out: int, scale: float, mode: str = "bicubic"
) -> jnp.ndarray:
    """Dense 1-D resize operator matching torch `F.interpolate` semantics.

    torch with an explicit `scale_factor` maps dst→src as
    ``src = (dst + 0.5) / scale - 0.5`` (align_corners=False) and uses cubic
    convolution with a = -0.75 ('bicubic') or linear weights ('linear'),
    clamping source indices to the valid range. Precomputing the operator as a
    matrix turns every resize in the model (DINO pos-emb bicubic interpolation,
    SAM rel-pos linear interpolation) into a matmul — exact, differentiable and
    MXU-friendly. Behavioral parity target: `vits_histo.py:377-402`,
    `SAM/image_encoder.py:321-351`.
    """
    import numpy as np

    a = -0.75

    def cubic(t: "np.ndarray") -> "np.ndarray":
        t = np.abs(t)
        return np.where(
            t <= 1.0,
            (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
            np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
        )

    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        if mode == "bicubic":
            base = int(np.floor(src))
            idx = np.arange(base - 1, base + 3)
            w = cubic(src - idx)
        elif mode == "linear":
            base = int(np.floor(src))
            idx = np.array([base, base + 1])
            frac = src - base
            w = np.array([1.0 - frac, frac])
        else:
            raise ValueError(f"unknown resize mode {mode}")
        idx = np.clip(idx, 0, n_in - 1)
        for j, wj in zip(idx, w):
            mat[i, j] += wj
    return jnp.asarray(mat, dtype=jnp.float32)
