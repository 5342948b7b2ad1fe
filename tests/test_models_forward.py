"""Shape/smoke tests for the model zoo forward passes (CPU).

Tiny configs (embed 64, depth 4, 64×64 inputs) keep CPU runtime in seconds;
full-size presets are covered by `slow`-marked tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellvit_tpu.models import CellViT, CellViT256, CellViTSAM


def tiny_cellvit(**kw):
    cfg = dict(
        num_nuclei_classes=6,
        num_tissue_classes=19,
        embed_dim=64,
        depth=4,
        num_heads=2,
        extract_layers=(1, 2, 3, 4),
        encoder_type="histo",
    )
    cfg.update(kw)
    return CellViT(**cfg)


def tiny_sam_cellvit(**kw):
    cfg = dict(
        num_nuclei_classes=6,
        num_tissue_classes=19,
        embed_dim=64,
        depth=4,
        num_heads=2,
        extract_layers=(1, 2, 3, 4),
        encoder_type="sam",
        global_attn_indexes=(1, 3),
        window_size=2,
        prompt_embed_dim=32,
    )
    cfg.update(kw)
    return CellViT(**cfg)


def _forward(model, x):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    return variables, out


def test_tiny_cellvit_forward_shapes():
    model = tiny_cellvit()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    _, out = _forward(model, x)
    assert out["tissue_types"].shape == (2, 19)
    assert out["nuclei_binary_map"].shape == (2, 64, 64, 2)
    assert out["hv_map"].shape == (2, 64, 64, 2)
    assert out["nuclei_type_map"].shape == (2, 64, 64, 6)


def test_tiny_cellvit_regression_and_tokens():
    model = tiny_cellvit(regression_loss=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False, retrieve_tokens=True)
    assert out["nuclei_binary_map"].shape == (1, 64, 64, 2)
    assert out["regression_map"].shape == (1, 64, 64, 2)
    assert out["tokens"].shape == (1, 4, 4, 64)


def test_tiny_sam_cellvit_forward_shapes():
    model = tiny_sam_cellvit()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    _, out = _forward(model, x)
    assert out["tissue_types"].shape == (1, 19)
    assert out["nuclei_binary_map"].shape == (1, 64, 64, 2)
    assert out["hv_map"].shape == (1, 64, 64, 2)
    assert out["nuclei_type_map"].shape == (1, 64, 64, 6)


def test_tiny_cellvit_train_mode_batchnorm_mutates():
    model = tiny_cellvit()
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert "batch_stats" in mutated
    leaves_a = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_b = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))


def test_histo_vit_pos_embed_interpolation():
    """pos-emb path must handle both pretrain (14×14) and other grids."""
    from cellvit_tpu.models.vit import HistoViT

    vit = HistoViT(
        embed_dim=32, depth=1, num_heads=2, extract_layers=(1,),
        pretrain_img_size=64,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(0), x, train=False)
    _, _, skips = vit.apply(variables, x, train=False)
    assert skips[0].shape == (1, 17, 32)
    # different input size goes through bicubic interpolation
    x2 = jnp.zeros((1, 96, 96, 3), jnp.float32)
    _, _, skips2 = vit.apply(variables, x2, train=False)
    assert skips2[0].shape == (1, 37, 32)


@pytest.mark.slow
def test_cellvit256_full_forward_shapes():
    model = CellViT256(num_nuclei_classes=6, num_tissue_classes=19)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    _, out = _forward(model, x)
    assert out["nuclei_type_map"].shape == (1, 256, 256, 6)


@pytest.mark.slow
def test_cellvit_sam_b_full_forward_shapes():
    model = CellViTSAM(
        num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-B"
    )
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    _, out = _forward(model, x)
    assert out["nuclei_type_map"].shape == (1, 256, 256, 6)


def test_storage_dataclasses():
    import numpy as np

    from cellvit_tpu.models.storage import (
        DataclassCPPStorage,
        DataclassHVStorage,
        DataclassStarDistStorage,
    )

    b, h, w = 2, 32, 32
    hv = DataclassHVStorage(
        nuclei_binary_map=np.zeros((b, h, w, 2)),
        hv_map=np.zeros((b, h, w, 2)),
        tissue_types=np.zeros((b, 19)),
        nuclei_type_map=np.zeros((b, h, w, 6)),
        instance_map=np.zeros((b, h, w), np.int32),
        instance_types_nuclei=np.zeros((b, h, w, 6), np.int32),
        batch_size=b, h=h, w=w,
    )
    d = hv.get_dict()
    assert "regression_map" not in d  # dropped when regression_loss=False
    assert d["batch_size"] == b

    sd = DataclassStarDistStorage(
        dist_map=np.zeros((b, h, w, 1)),
        stardist_map=np.zeros((b, h, w, 32)),
        nuclei_type_map=np.zeros((b, h, w, 6)),
        batch_size=b,
    )
    assert sd.get_dict()["instance_map"] is None

    cpp = DataclassCPPStorage(
        dist_map=np.zeros((b, h, w, 1)),
        stardist_map=np.zeros((b, h, w, 32)),
        nuclei_type_map=np.zeros((b, h, w, 6)),
        batch_size=b,
        stardist_map_refined=np.zeros((b, h, w, 32)),
    )
    assert "stardist_map_refined" in cpp.get_dict()


def test_vit_presets_dinohead_embedder():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cellvit_tpu.models.vit import (
        DINOHead,
        ViT256Embedder,
        vit_base,
        vit_small,
        vit_tiny,
    )
    from cellvit_tpu.utils.tools import cropping_center

    for factory, dim in [(vit_tiny, 192), (vit_small, 384), (vit_base, 768)]:
        m = factory(num_classes=0)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        _, cls, _ = m.apply(v, jnp.zeros((1, 32, 32, 3)))
        assert cls.shape == (1, dim)

    head = DINOHead(out_dim=48, nlayers=2)
    v = head.init(jax.random.PRNGKey(0), jnp.zeros((3, 384)))
    out = head.apply(v, jnp.ones((3, 384)))
    assert out.shape == (3, 48) and np.isfinite(np.asarray(out)).all()

    emb = ViT256Embedder()  # random init, no checkpoint
    grid = emb(np.zeros((1, 520, 300, 3), np.float32))
    assert grid.shape == (1, 2, 1, 384)  # 520→2 tiles, 300→1 tile

    x = np.arange(6 * 8).reshape(6, 8)
    c = cropping_center(x, (2, 4))
    assert c.shape == (2, 4) and c[0, 0] == x[2, 2]
    xb = x[None]
    assert cropping_center(xb, (2, 4), batch=True).shape == (1, 2, 4)
