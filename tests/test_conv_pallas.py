"""conv3x3_pallas correctness vs lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _ref(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def test_conv3x3_pallas_matches_conv():
    from cellvit_tpu.ops.conv_pallas import conv3x3_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32))
    got = conv3x3_pallas(x, w, block_h=8, interpret=True)
    want = _ref(x, w).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv3x3_pallas_fused_bn_relu():
    from cellvit_tpu.ops.conv_pallas import conv3x3_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (8,)).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    got = conv3x3_pallas(
        x, w, scale=scale, shift=shift, relu=True, block_h=4, interpret=True
    )
    want = jnp.maximum(_ref(x, w) * scale + shift, 0.0).astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )
