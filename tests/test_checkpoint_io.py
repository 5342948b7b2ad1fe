"""Checkpoint converter tests: export→import round trip and full coverage
against the real flax model structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellvit_tpu.models.cellvit import CellViT
from cellvit_tpu.models.checkpoint_io import (
    convert_encoder_state_dict,
    convert_state_dict,
    export_torch_state_dict,
    unflatten_dict,
)


def _tiny_model(encoder_type="histo"):
    kw = dict(
        num_nuclei_classes=4,
        num_tissue_classes=5,
        embed_dim=32,
        depth=4,
        num_heads=2,
        extract_layers=(1, 2, 3, 4),
        encoder_type=encoder_type,
    )
    if encoder_type == "sam":
        kw.update(global_attn_indexes=(1, 3), window_size=2, prompt_embed_dim=16)
    return CellViT(**kw)


def _init_vars(model, size=64):
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x, train=False)


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


@pytest.mark.parametrize("encoder_type", ["histo", "sam"])
def test_roundtrip_identity_and_coverage(encoder_type):
    model = _tiny_model(encoder_type)
    variables = _init_vars(model)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    sd = export_torch_state_dict(variables, sam_encoder=encoder_type == "sam")
    assert len(sd) > 0
    # every exported tensor must be a numpy array with torch-layout shapes
    assert all(isinstance(v, np.ndarray) for v in sd.values())

    back = convert_state_dict(sd, sam_encoder=encoder_type == "sam", strict=True)

    orig = dict(_tree_paths(variables["params"]))
    conv = dict(_tree_paths(back["params"]))
    assert set(orig) == set(conv), (
        f"missing: {set(orig) - set(conv)}, extra: {set(conv) - set(orig)}"
    )
    for path, a in orig.items():
        np.testing.assert_allclose(
            np.asarray(a), conv[path], rtol=1e-6, atol=1e-6, err_msg=str(path)
        )

    orig_bs = dict(_tree_paths(variables["batch_stats"]))
    conv_bs = dict(_tree_paths(back["batch_stats"]))
    assert set(orig_bs) == set(conv_bs)


@pytest.mark.parametrize("encoder_type", ["histo", "sam"])
def test_converted_variables_run_forward(encoder_type):
    model = _tiny_model(encoder_type)
    variables = _init_vars(model)
    sd = export_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, variables),
        sam_encoder=encoder_type == "sam",
    )
    back = convert_state_dict(sd, sam_encoder=encoder_type == "sam")
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    out_a = model.apply(variables, x, train=False)
    out_b = model.apply(back, x, train=False)
    for k in out_a:
        np.testing.assert_allclose(
            np.asarray(out_a[k]), np.asarray(out_b[k]), rtol=1e-5, atol=1e-5
        )


def test_encoder_only_import_with_prefixes():
    """DINO-style prefixed encoder checkpoints load into the encoder subtree."""
    model = _tiny_model("histo")
    variables = _init_vars(model)
    sd = export_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, variables), sam_encoder=False
    )
    enc_sd = {
        "module.backbone." + k[len("encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.")
    }
    enc_sd["module.head.mlp.weight"] = np.zeros((3, 3), np.float32)  # DINO head noise
    enc_vars = convert_encoder_state_dict(enc_sd, sam_encoder=False)
    orig = dict(_tree_paths(variables["params"]["encoder"]))
    conv = dict(_tree_paths(enc_vars["params"]["encoder"]))
    assert set(orig) == set(conv)


def test_unflatten_dict():
    flat = {"a.b.c": 1, "a.b.d": 2, "e": 3}
    assert unflatten_dict(flat) == {"a": {"b": {"c": 1, "d": 2}}, "e": 3}
