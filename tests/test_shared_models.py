"""Shared-decoder variant tests: forward shapes + checkpoint round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellvit_tpu.models.checkpoint_io import (
    convert_state_dict,
    export_torch_state_dict,
)
from cellvit_tpu.models.shared import CellViTShared, CellViTStarDistShared


def tiny_shared(cls=CellViTShared, **kw):
    cfg = dict(
        num_nuclei_classes=6, num_tissue_classes=5, embed_dim=32, depth=4,
        num_heads=2, extract_layers=(1, 2, 3, 4), encoder_type="histo",
    )
    cfg.update(kw)
    return cls(**cfg)


def test_shared_forward_shapes():
    model = tiny_shared()
    x = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["nuclei_binary_map"].shape == (2, 64, 64, 2)
    assert out["hv_map"].shape == (2, 64, 64, 2)
    assert out["nuclei_type_map"].shape == (2, 64, 64, 6)
    # the shared tower exists exactly once
    assert "decoder" in v["params"]
    assert "hv_map_decoder" in v["params"]
    assert "kernel" in v["params"]["hv_map_decoder"]


def test_shared_regression_split():
    model = tiny_shared(regression_loss=True)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["nuclei_binary_map"].shape == (1, 64, 64, 2)
    assert out["regression_map"].shape == (1, 64, 64, 2)


def test_stardist_shared_forward():
    model = tiny_shared(CellViTStarDistShared, nrays=8)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["stardist_map"].shape == (1, 64, 64, 8)
    assert float(out["stardist_map"].min()) >= 0.0
    assert out["dist_map"].shape == (1, 64, 64, 1)


@pytest.mark.parametrize("cls", [CellViTShared, CellViTStarDistShared])
def test_shared_checkpoint_roundtrip(cls):
    model = tiny_shared(cls)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    sd = export_torch_state_dict(variables, sam_encoder=False)
    # shared tower exports under the reference's `decoder.` names
    assert any(k.startswith("decoder.decoder1_skip.0.block.0") for k in sd)
    assert "decoder.bottleneck_upsampler.weight" in sd
    back = convert_state_dict(sd, sam_encoder=False)
    out_a = model.apply(variables, x, train=False)
    out_b = model.apply(back, x, train=False)
    for key in out_a:
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]), atol=1e-6,
            err_msg=key,
        )
