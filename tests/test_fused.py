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
