"""Orbax checkpointer: round-trip, sharding preservation, retention/best.

Covers the TPU-native checkpoint path (`train/checkpoint_orbax.py`) that
replaces host-gather msgpack snapshots for pod-scale training — reference
checkpoint semantics are `/root/reference/base_ml/base_trainer.py:229-269`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellvit_tpu.parallel import make_mesh
from cellvit_tpu.parallel.partitioning import apply_tp_shardings
from cellvit_tpu.train.checkpoint_orbax import OrbaxCheckpointer
from cellvit_tpu.train.losses import retrieve_loss_fn
from cellvit_tpu.train.optim import make_lr_schedule, retrieve_optimizer
from cellvit_tpu.train.trainer import CellViTTrainer
from tests.test_models_forward import tiny_cellvit

LOSSES = {
    "nuclei_binary_map": {
        "bce": {"loss_fn": retrieve_loss_fn("xentropy_loss"), "weight": 1},
    },
    "hv_map": {
        "mse": {"loss_fn": retrieve_loss_fn("mse_loss_maps"), "weight": 1},
    },
    "nuclei_type_map": {
        "bce": {"loss_fn": retrieve_loss_fn("xentropy_loss"), "weight": 1},
    },
    "tissue_types": {
        "ce": {"loss_fn": retrieve_loss_fn("CrossEntropyLoss"), "weight": 1},
    },
}


def _make_trainer(mesh):
    model = tiny_cellvit()
    schedule = make_lr_schedule("constant", 1e-3, epochs=1, steps_per_epoch=1)
    tx = retrieve_optimizer("AdamW", {"lr": 1e-3}, schedule)
    return model, CellViTTrainer(
        model=model,
        loss_fn_dict=LOSSES,
        optimizer=tx,
        num_classes=6,
        tissue_types={"a": 0},
        mesh=mesh,
    )


@pytest.fixture(scope="module")
def state_and_trainer():
    mesh = make_mesh(n_data=4, n_model=2)
    model, trainer = _make_trainer(mesh)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    variables = apply_tp_shardings(variables, mesh)
    state = trainer.create_state(variables, keep_param_shardings=True)
    return state, trainer, mesh


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(fb)
    for path, va in fa:
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(fb[jax.tree_util.keystr(path)]),
            err_msg=jax.tree_util.keystr(path),
        )


def test_roundtrip_and_meta(tmp_path, state_and_trainer):
    state, trainer, _ = state_and_trainer
    with OrbaxCheckpointer(tmp_path / "ckpt", async_save=False) as ck:
        assert ck.save(0, state, meta={"epoch": 0, "arch": "tiny"})
        fresh = trainer.create_state(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        restored, meta = ck.restore(fresh)
    assert meta == {"epoch": 0, "arch": "tiny"}
    _assert_tree_equal(state.params, restored.params)
    _assert_tree_equal(state.batch_stats, restored.batch_stats)
    _assert_tree_equal(state.opt_state, restored.opt_state)
    assert int(restored.step) == int(state.step)


def test_restore_preserves_shardings(tmp_path, state_and_trainer):
    state, trainer, mesh = state_and_trainer
    # a TP-sharded leaf: encoder qkv kernel is split over the model axis
    def tp_leaf(tree):
        return tree["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]

    src = tp_leaf(state.params)
    assert not src.sharding.is_fully_replicated  # premise: state IS sharded
    with OrbaxCheckpointer(tmp_path / "ckpt", async_save=False) as ck:
        ck.save(0, state)
        restored, _ = ck.restore(state)
    got = tp_leaf(restored.params)
    assert got.sharding.is_equivalent_to(src.sharding, got.ndim)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(src))


def test_async_save_commits_after_wait(tmp_path, state_and_trainer):
    state, trainer, _ = state_and_trainer
    ck = OrbaxCheckpointer(tmp_path / "ckpt", async_save=True)
    ck.save(0, state, meta={"epoch": 0})
    ck.wait()
    assert ck.latest_step() == 0
    restored, meta = ck.restore(state)
    assert meta["epoch"] == 0
    _assert_tree_equal(state.params, restored.params)
    ck.close()


def test_retention_keeps_best_and_latest(tmp_path, state_and_trainer):
    state, _, _ = state_and_trainer
    with OrbaxCheckpointer(
        tmp_path / "ckpt", max_to_keep=2, monitor="bPQ", async_save=False
    ) as ck:
        ck.save(0, state, metrics={"bPQ": 0.9})
        ck.save(1, state, metrics={"bPQ": 0.2})
        ck.save(2, state, metrics={"bPQ": 0.3})
        assert ck.best_step() == 0  # best survives GC
        assert ck.latest_step() == 2
        restored, _ = ck.restore(state, step=ck.best_step())
        assert int(restored.step) == int(state.step)


def test_retention_latest_survives_when_metric_worst(tmp_path, state_and_trainer):
    """ADVICE r3 (high): with BestN-only retention the newest checkpoint was
    GC'd whenever its metric wasn't top-N, so crash/resume lost recent
    epochs. LatestN(1) must pin it (base_trainer.py:203-211 semantics)."""
    state, _, _ = state_and_trainer
    with OrbaxCheckpointer(
        tmp_path / "ckpt", max_to_keep=2, monitor="bPQ", async_save=False
    ) as ck:
        ck.save(0, state, metrics={"bPQ": 0.9})
        ck.save(1, state, metrics={"bPQ": 0.8})
        ck.save(2, state, metrics={"bPQ": 0.1})  # newest AND metric-worst
        assert ck.latest_step() == 2
        assert ck.best_step() == 0
        restored, _ = ck.restore(state)  # default = latest
        assert int(restored.step) == int(state.step)


def test_retention_min_mode_keeps_lowest(tmp_path, state_and_trainer):
    """ADVICE r3 (medium): a minimize monitor (e.g. a loss) must rank with
    mode='min' — under 'max' best-retention kept the worst checkpoint."""
    state, _, _ = state_and_trainer
    with OrbaxCheckpointer(
        tmp_path / "ckpt", max_to_keep=1, monitor="loss", mode="min",
        async_save=False,
    ) as ck:
        ck.save(0, state, metrics={"loss": 9.9})
        ck.save(1, state, metrics={"loss": 0.1})
        ck.save(2, state, metrics={"loss": 5.0})
        assert ck.best_step() == 1  # the loss=0.1 step survives GC
        ck.restore(state, step=1)


def test_retention_metricless_saves_bounded(tmp_path, state_and_trainer):
    """ADVICE r3 (medium): metric-less save_latest() snapshots (non-eval
    epochs) must be garbage-collected, not accumulate unboundedly."""
    state, _, _ = state_and_trainer
    with OrbaxCheckpointer(
        tmp_path / "ckpt", max_to_keep=2, monitor="bPQ", async_save=False
    ) as ck:
        ck.save(0, state, metrics={"bPQ": 0.5})
        for step in range(1, 6):
            ck.save(step, state)  # no metrics (non-eval epochs)
        steps = ck.manager.all_steps()
        assert ck.latest_step() == 5
        assert 0 in steps  # metric-best survives
        assert len(steps) <= 3  # best N=2 + latest, not 6


def test_restore_missing_raises(tmp_path, state_and_trainer):
    state, _, _ = state_and_trainer
    with OrbaxCheckpointer(tmp_path / "empty", async_save=False) as ck:
        with pytest.raises(FileNotFoundError):
            ck.restore(state)
