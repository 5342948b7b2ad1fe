"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cellvit_tpu.parallel import make_mesh, shard_batch
from cellvit_tpu.parallel.partitioning import apply_tp_shardings


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"image": np.zeros((16, 8, 8, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    spec = sharded["image"].sharding.spec
    assert spec == P("data")


def test_tp_shardings_on_encoder():
    from tests.test_models_forward import tiny_cellvit

    mesh = make_mesh(n_data=4, n_model=2)
    model = tiny_cellvit()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    placed = apply_tp_shardings(variables, mesh)
    qkv = placed["params"]["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    proj = placed["params"]["encoder"]["blocks_0"]["attn"]["proj"]["kernel"]
    fc1 = placed["params"]["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    assert proj.sharding.spec == P("model", None)
    assert fc1.sharding.spec == P(None, "model")
    # decoders replicated
    dec = jax.tree_util.tree_leaves(placed["params"]["hv_map_decoder"])[0]
    assert dec.sharding.spec == P()
    # forward still correct vs replicated run
    x = jnp.ones((2, 64, 64, 3))
    out_ref = model.apply(variables, x, train=False)
    out_tp = model.apply(placed, x, train=False)
    for k in out_ref:
        np.testing.assert_allclose(
            np.asarray(out_ref[k]), np.asarray(out_tp[k]), atol=1e-5
        )


def test_sequence_parallel_forward_identity():
    """token_spec shards the encoder's token axis over the model axis
    (sequence parallelism); outputs must match the unsharded forward.
    N = 17 tokens over 2 shards exercises the uneven-sharding path."""
    from tests.test_models_forward import tiny_cellvit
    from cellvit_tpu.parallel import seq_sharding

    mesh = make_mesh(n_data=4, n_model=2)
    base = tiny_cellvit()
    sp = tiny_cellvit(token_spec=seq_sharding(mesh))

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 64, 64, 3)).astype(np.float32)
    )
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref = jax.jit(lambda v, x: base.apply(v, x, train=False))(variables, x)
    with mesh:
        got = jax.jit(lambda v, x: sp.apply(v, x, train=False))(variables, x)
    for key in ref:
        np.testing.assert_allclose(
            np.asarray(ref[key], np.float32),
            np.asarray(got[key], np.float32),
            atol=2e-5, rtol=1e-5, err_msg=key,
        )


def test_pipeline_parallel_encoder_identity():
    """GPipe-style pipelined encoder (blocks staged over a 4-device "pipe"
    axis, microbatches circulating via ppermute) must reproduce the
    sequential HistoViT forward — logits, CLS token, and every skip."""
    from cellvit_tpu.models.vit import HistoViT
    from cellvit_tpu.parallel import make_pipe_mesh, pipeline_encoder_apply

    enc = HistoViT(
        embed_dim=64, depth=4, num_heads=2, num_classes=3,
        extract_layers=(1, 2, 3, 4), pretrain_img_size=64,
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 64, 64, 3)).astype(np.float32)
    )
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    ref_logits, ref_cls, ref_skips = enc.apply(variables, x, train=False)

    mesh = make_pipe_mesh(4)
    got_logits, got_cls, got_skips = jax.jit(
        lambda v, x: pipeline_encoder_apply(enc, v, x, mesh, n_micro=2)
    )(variables, x)

    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(got_logits), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_cls), np.asarray(got_cls), atol=2e-5, rtol=1e-5
    )
    assert len(got_skips) == len(ref_skips)
    for i, (a, b) in enumerate(zip(ref_skips, got_skips)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5,
            err_msg=f"skip {i}",
        )


def test_dryrun_multichip_dp_tp():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # (data=4, model=2) mesh inside


def test_remat_training_step():
    """Rematerialized encoder trains identically (same loss value)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cellvit_tpu.models.cellvit import CellViT

    kw = dict(
        num_nuclei_classes=6, num_tissue_classes=5, embed_dim=32, depth=4,
        num_heads=2, extract_layers=(1, 2, 3, 4), encoder_type="histo",
    )
    m_plain = CellViT(**kw)
    m_remat = CellViT(**kw, remat=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)),
                    jnp.float32)
    v = m_plain.init(jax.random.PRNGKey(0), x, train=False)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.mean(out["hv_map"] ** 2) + jnp.mean(out["tissue_types"] ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(m_plain, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(m_remat, p))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    a = jax.tree_util.tree_leaves(g1)[0]
    b = jax.tree_util.tree_leaves(g2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_mesh_sharded_wsi_inference_matches_single_device():
    """Patch-batch sharding over the data axis produces identical device
    outputs to unsharded inference, including ragged-tail padding
    (SURVEY §2.10: patch-batch sharding for WSI inference)."""
    from cellvit_tpu.inference.cell_detection import CellSegmentationInference
    from cellvit_tpu.utils.logger import Logger
    from tests.test_models_forward import tiny_cellvit

    model = tiny_cellvit()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    def make(mesh):
        inf = CellSegmentationInference.__new__(CellSegmentationInference)
        inf.logger = Logger(level="WARNING").create_logger()
        inf.batch_size = 5
        inf.max_instances = 64
        inf.mesh = mesh
        inf.mean = np.array([0.5, 0.5, 0.5], np.float32)
        inf.std = np.array([0.5, 0.5, 0.5], np.float32)
        inf.num_nuclei_classes = 6
        inf.variables = variables
        inf.model = model
        inf._forward = jax.jit(
            lambda v, a: model.apply(v, a, train=False, retrieve_tokens=True)
        )
        return inf

    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, (5, 64, 64, 3)).astype(np.float32)  # ragged vs 4

    single = make(None)
    inst_a, stats_a, tok_a = single._device_outputs(imgs, magnification=40)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = make(mesh)
    inst_b, stats_b, tok_b = sharded._device_outputs(imgs, magnification=40)

    # instance maps: label-agreement, not bit-exactness — sharded float
    # accumulation order can flip a near-threshold pixel and renumber a
    # label even when the segmentation is identical in substance
    fg_a, fg_b = inst_a > 0, inst_b > 0
    assert (fg_a == fg_b).mean() > 0.999, (fg_a != fg_b).sum()
    if fg_a.sum():
        matched = 0
        for rid in np.unique(inst_a[fg_a]):
            sel = inst_a == rid
            oid = np.bincount(inst_b[sel]).argmax()
            matched += (inst_b[sel] == oid).sum()
        assert matched / fg_a.sum() > 0.999
    np.testing.assert_allclose(tok_a, tok_b, rtol=1e-5, atol=1e-5)
    for k in stats_a:
        np.testing.assert_allclose(
            stats_a[k], stats_b[k], rtol=1e-4, atol=1e-4, err_msg=k
        )
