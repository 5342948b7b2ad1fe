"""Channel-major Pallas conv kernel vs the XLA conv oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellvit_tpu.ops.conv_cm import (
    cm_to_nhwc,
    conv3x3_cm,
    conv3x3_cm_reference,
    nhwc_to_cm,
    pack_kernel_cm,
)


@pytest.mark.parametrize("shape,rows", [
    ((2, 64, 32, 256, 64), 8),   # d0-like channels, several row blocks
    ((1, 8, 16, 128, 16), 4),    # tiny, rows not covering H
    ((1, 16, 8, 128, 8), 8),     # single row block (both edges in one)
])
def test_conv3x3_cm_matches_xla(rng, shape, rows):
    b, c, h, w, f = shape
    x = jnp.asarray(rng.standard_normal((b, c, h, w)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(f), jnp.float32)
    out = conv3x3_cm(x, k, bias, rows=rows, relu=True, interpret=True)
    ref = conv3x3_cm_reference(x, k, bias, relu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv3x3_cm_no_bias_no_relu(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    out = conv3x3_cm(x, k, rows=8, interpret=True)
    ref = conv3x3_cm_reference(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert float(jnp.min(out)) < 0  # relu really off


def test_conv3x3_cm_bf16(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 16, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.bfloat16)
    out = conv3x3_cm(x, k, rows=8, interpret=True)
    ref = conv3x3_cm_reference(x, k)
    d = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    assert float(d) < 0.1


@pytest.mark.parametrize("block", [0, 1, 2])
def test_conv3x3_cm_res_block(rng, block):
    """Fused residual add: channels [block*F, (block+1)*F) of a merged
    3F-channel buffer are added pre-relu, without slicing the buffer."""
    b, c, h, w, f = 1, 16, 16, 128, 8
    x = jnp.asarray(rng.standard_normal((b, c, h, w)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(f), jnp.float32)
    res = jnp.asarray(rng.standard_normal((b, 3 * f, h, w)), jnp.float32)
    out = conv3x3_cm(
        x, k, bias, rows=8, relu=True, res=res, res_block=block,
        interpret=True,
    )
    ref = conv3x3_cm_reference(x, k, bias, relu=True, res=res,
                               res_block=block)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv_t2x2_cm_matches_nhwc(rng):
    """CM depth-to-space convT == the NHWC one (models/fused.py),
    transposed."""
    from cellvit_tpu.models.fused import _conv_t2x2
    from cellvit_tpu.ops.conv_cm import conv_t2x2_cm

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 12)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 12, 6)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(6), jnp.float32)
    ref = _conv_t2x2(x, k, bias, jnp.float32)
    got = conv_t2x2_cm(x, k, bias, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(nhwc_to_cm(ref)), atol=2e-5
    )


def test_pack_kernel_layout():
    """Tap (dy, dx) must land at rows [(3dy+dx)C, ...) to match the panel."""
    w = np.zeros((3, 3, 2, 4), np.float32)
    w[2, 0, 1, 3] = 5.0  # dy=+1, dx=-1, c=1, f=3
    packed = np.asarray(pack_kernel_cm(jnp.asarray(w)))
    k = (2 * 3 + 0) * 2 + 1
    assert packed[3, k] == 5.0 and np.count_nonzero(packed) == 1


def test_layout_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(cm_to_nhwc(nhwc_to_cm(x.transpose(0, 2, 3, 1)))),
        np.asarray(x.transpose(0, 2, 3, 1)),
    )
