"""Fused inference decoder (models/fused.py) vs the module forward.

The fused path restructures the towers (concat-free split convs, merged
shared-input convs, folded inference BN) — outputs must match the standard
`model.apply` forward on every branch, with randomized BN stats so the
folding is actually exercised.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _randomize_batch_stats(variables, seed=1):
    key = [jax.random.PRNGKey(seed)]

    def rnd(a):
        key[0], k = jax.random.split(key[0])
        return jax.random.uniform(k, a.shape, a.dtype, 0.5, 2.0)

    v = dict(variables)
    v["batch_stats"] = jax.tree_util.tree_map(rnd, v["batch_stats"])
    return v


@pytest.mark.parametrize("regression", [False, True])
def test_fused_forward_matches_module(regression):
    from cellvit_tpu.models import CellViT
    from cellvit_tpu.models.fused import fused_forward

    m = CellViT(
        num_nuclei_classes=6, num_tissue_classes=19, embed_dim=64, depth=4,
        num_heads=2, extract_layers=(1, 2, 3, 4), encoder_type="histo",
        regression_loss=regression,
    )
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    v = _randomize_batch_stats(v)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    ref = m.apply(v, x, train=False)
    got = jax.jit(lambda v, x: fused_forward(m, v, x))(v, x)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-4,
            err_msg=k,
        )


@pytest.mark.parametrize("regression", [False, True])
def test_fused_forward_maps_matches_fused(regression):
    """The W-minor maps path must agree with the channel-minor path:
    np_prob == softmax(nb)[..., 1], hv0/hv1 == hv_map channels,
    type_map_cmajor == nuclei_type_map transposed."""
    from cellvit_tpu.models import CellViT
    from cellvit_tpu.models.fused import fused_forward, fused_forward_maps

    m = CellViT(
        num_nuclei_classes=6, num_tissue_classes=19, embed_dim=64, depth=4,
        num_heads=2, extract_layers=(1, 2, 3, 4), encoder_type="histo",
        regression_loss=regression,
    )
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    v = _randomize_batch_stats(v)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    ref = jax.jit(lambda v, x: fused_forward(m, v, x))(v, x)
    got = jax.jit(lambda v, x: fused_forward_maps(m, v, x))(v, x)
    np.testing.assert_allclose(
        np.asarray(got["np_prob"]),
        np.asarray(
            jax.nn.softmax(ref["nuclei_binary_map"].astype(jnp.float32), -1)
        )[..., 1],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got["hv0"]), np.asarray(ref["hv_map"][..., 0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got["hv1"]), np.asarray(ref["hv_map"][..., 1]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got["type_map_cmajor"]),
        np.asarray(ref["nuclei_type_map"]).transpose(0, 3, 1, 2), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got["tissue_types"]), np.asarray(ref["tissue_types"]),
        atol=1e-6)
    if regression:
        np.testing.assert_allclose(
            np.asarray(got["reg0"]),
            np.asarray(ref["regression_map"][..., 0]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got["reg1"]),
            np.asarray(ref["regression_map"][..., 1]), atol=1e-6)


def test_instance_map_batch_maps_matches():
    """The scalar-maps postproc entry equals the (B,H,W,2) entry."""
    from cellvit_tpu.ops.hv_postproc import (
        instance_map_batch, instance_map_batch_maps)

    rng = np.random.default_rng(5)
    size = 128
    np_prob = np.zeros((2, size, size), np.float32)
    hv = rng.uniform(-1, 1, (2, size, size, 2)).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for b in range(2):
        for _ in range(12):
            cy, cx = rng.integers(8, size - 8, 2)
            r = int(rng.integers(3, 7))
            np_prob[b][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 0.9
    a = np.asarray(instance_map_batch(jnp.asarray(np_prob), jnp.asarray(hv)))
    b = np.asarray(instance_map_batch_maps(
        jnp.asarray(np_prob), jnp.asarray(hv[..., 0]), jnp.asarray(hv[..., 1])))
    np.testing.assert_array_equal(a, b)


def test_fused_forward_matches_module_sam():
    from cellvit_tpu.models import CellViT
    from cellvit_tpu.models.fused import fused_forward

    m = CellViT(
        num_nuclei_classes=6, num_tissue_classes=19, embed_dim=96, depth=4,
        num_heads=2, extract_layers=(1, 2, 3, 4), encoder_type="sam",
        global_attn_indexes=(1, 3), window_size=4, patch_size=16,
    )
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    v = _randomize_batch_stats(v)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    ref = m.apply(v, x, train=False)
    got = jax.jit(lambda v, x: fused_forward(m, v, x))(v, x)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-4,
            err_msg=k,
        )
