"""conv3x3_mm parity vs lax.conv (fwd + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _ref_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def test_conv3x3_mm_matches_lax_conv():
    from cellvit_tpu.ops.conv3x3 import conv3x3_mm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 17, 13, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 5)).astype(np.float32))
    got = conv3x3_mm(x, w)
    want = _ref_conv(x, w).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv3x3_mm_grads_match():
    from cellvit_tpu.ops.conv3x3 import conv3x3_mm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 9, 9, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)).astype(np.float32))

    g1 = jax.grad(lambda x, w: jnp.sum(conv3x3_mm(x, w) ** 2), argnums=(0, 1))(x, w)
    g2 = jax.grad(
        lambda x, w: jnp.sum(_ref_conv(x, w).astype(x.dtype) ** 2), argnums=(0, 1)
    )(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_conv3x3_mm_bf16_matches_conv_bf16():
    from cellvit_tpu.ops.conv3x3 import conv3x3_mm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32)).astype(jnp.bfloat16)
    got = np.asarray(conv3x3_mm(x, w).astype(jnp.float32))
    want = np.asarray(_ref_conv(x, w).astype(jnp.float32))
    # bf16 inputs, fp32 accumulation in both — tap-order differences only
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
