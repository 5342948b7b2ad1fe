"""Legacy HoVer-Net support blocks (not on the CellViT path).

Functional equivalents of `models/utils/` in the reference: MIL attention
pooling (`attention.py:14-149`: Attention, AttentionGated), pre-activation
DenseBlock (`dense.py`), pre-activation ResidualBlock (`residual.py`), and
TensorFlow-style SAME padding (`tf_utils.py`). Kept for API completeness —
the reference ships them as support code for HoVer-Net-lineage models.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MILAttention(nn.Module):
    """Multiple-instance-learning attention pooling: A = W₂·tanh(W₁·H)."""

    in_features: int
    attention_features: int = 128
    num_classes: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, *, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        a = nn.Dense(self.attention_features, dtype=self.dtype, name="fc1")(h)
        a = jnp.tanh(a)
        if self.dropout > 0:
            a = nn.Dropout(self.dropout, deterministic=not train)(a)
        a = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(a)
        weights = jax.nn.softmax(a, axis=-2)
        pooled = jnp.sum(weights * h[..., None, :], axis=-2) if False else jnp.einsum(
            "...nc,...nd->...cd", weights, h
        )
        return pooled, weights


class MILAttentionGated(nn.Module):
    """Gated MIL attention: A = W·(tanh(V·H) ⊙ σ(U·H))."""

    in_features: int
    attention_features: int = 128
    num_classes: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, *, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        v = jnp.tanh(nn.Dense(self.attention_features, dtype=self.dtype, name="V")(h))
        u = jax.nn.sigmoid(
            nn.Dense(self.attention_features, dtype=self.dtype, name="U")(h)
        )
        if self.dropout > 0:
            v = nn.Dropout(self.dropout, deterministic=not train)(v)
            u = nn.Dropout(self.dropout, deterministic=not train)(u)
        a = nn.Dense(self.num_classes, dtype=self.dtype, name="W")(v * u)
        weights = jax.nn.softmax(a, axis=-2)
        pooled = jnp.einsum("...nc,...nd->...cd", weights, h)
        return pooled, weights


def tf_same_pad(x: jax.Array, ksize: int, stride: int) -> jax.Array:
    """TensorFlow-style asymmetric SAME padding (reference
    TFSamepaddingLayer): extra pixel goes to the bottom/right."""
    h, w = x.shape[1], x.shape[2]
    pad_h = max(ksize - stride, 0) if h % stride == 0 else max(ksize - h % stride, 0)
    pad_w = max(ksize - stride, 0) if w % stride == 0 else max(ksize - w % stride, 0)
    return jnp.pad(
        x,
        (
            (0, 0),
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
            (0, 0),
        ),
    )


class DenseBlock(nn.Module):
    """Pre-activation dense block (BN→ReLU→1×1 conv→BN→ReLU→k×k conv,
    concatenating unit outputs; reference dense.py)."""

    unit_ksize: Sequence[int]
    unit_ch: Sequence[int]
    unit_count: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        for i in range(self.unit_count):
            y = nn.relu(bn(f"u{i}_preact_bn")(x))
            y = nn.Conv(
                self.unit_ch[0], (self.unit_ksize[0], self.unit_ksize[0]),
                use_bias=False, dtype=self.dtype, name=f"u{i}_conv1",
            )(y)
            y = nn.relu(bn(f"u{i}_conv1_bn")(y))
            y = nn.Conv(
                self.unit_ch[1], (self.unit_ksize[1], self.unit_ksize[1]),
                padding="VALID", use_bias=False, dtype=self.dtype,
                name=f"u{i}_conv2",
            )(y)
            crop = (x.shape[1] - y.shape[1]) // 2
            xc = x[:, crop : crop + y.shape[1], crop : crop + y.shape[2]]
            x = jnp.concatenate([xc, y], axis=-1)
        y = nn.relu(bn("blk_bna_bn")(x))
        return y


class ResidualBlock(nn.Module):
    """Pre-activation bottleneck residual block (reference residual.py)."""

    unit_ksize: Sequence[int]
    unit_ch: Sequence[int]
    unit_count: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        for i in range(self.unit_count):
            stride = self.stride if i == 0 else 1
            y = nn.relu(bn(f"u{i}_preact_bn")(x))
            shortcut_src = y if i == 0 else x
            y = nn.Conv(
                self.unit_ch[0], (self.unit_ksize[0], self.unit_ksize[0]),
                use_bias=False, dtype=self.dtype, name=f"u{i}_conv1",
            )(y)
            y = nn.relu(bn(f"u{i}_conv1_bn")(y))
            y = tf_same_pad(y, self.unit_ksize[1], stride)
            y = nn.Conv(
                self.unit_ch[1], (self.unit_ksize[1], self.unit_ksize[1]),
                strides=(stride, stride), padding="VALID", use_bias=False,
                dtype=self.dtype, name=f"u{i}_conv2",
            )(y)
            y = nn.relu(bn(f"u{i}_conv2_bn")(y))
            y = nn.Conv(
                self.unit_ch[2], (self.unit_ksize[2], self.unit_ksize[2]),
                use_bias=False, dtype=self.dtype, name=f"u{i}_conv3",
            )(y)
            if i == 0 and (
                x.shape[-1] != self.unit_ch[2] or self.stride != 1
            ):
                x = nn.Conv(
                    self.unit_ch[2], (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="shortcut",
                )(shortcut_src)
            x = x + y
        return nn.relu(bn("blk_bna_bn")(x))
