"""Trainer integration tests on a tiny model + synthetic PanNuke data."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellvit_tpu.data.datasets import PanNukeDataset
from cellvit_tpu.data.loader import DataLoader, RandomSampler
from cellvit_tpu.data.transforms import build_transforms
from cellvit_tpu.parallel import make_mesh
from cellvit_tpu.train import checkpoint as ckpt
from cellvit_tpu.train.early_stopping import EarlyStopping
from cellvit_tpu.train.losses import retrieve_loss_fn
from cellvit_tpu.train.optim import make_lr_schedule, retrieve_optimizer
from cellvit_tpu.train.trainer import CellViTTrainer, prepare_batch
from tests.synth import TISSUES, make_pannuke_dataset
from tests.test_models_forward import tiny_cellvit

DEFAULT_LOSSES = {
    "nuclei_binary_map": {
        "bce": {"loss_fn": retrieve_loss_fn("xentropy_loss"), "weight": 1},
        "dice": {"loss_fn": retrieve_loss_fn("dice_loss"), "weight": 1},
    },
    "hv_map": {
        "mse": {"loss_fn": retrieve_loss_fn("mse_loss_maps"), "weight": 1},
        "msge": {"loss_fn": retrieve_loss_fn("msge_loss_maps"), "weight": 1},
    },
    "nuclei_type_map": {
        "bce": {"loss_fn": retrieve_loss_fn("xentropy_loss"), "weight": 1},
        "dice": {"loss_fn": retrieve_loss_fn("dice_loss"), "weight": 1},
    },
    "tissue_types": {
        "ce": {"loss_fn": retrieve_loss_fn("CrossEntropyLoss"), "weight": 1},
    },
}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = make_pannuke_dataset(
        tmp_path_factory.mktemp("pannuke_train"), folds=(0,), n_images=8
    )
    _, val_tf = build_transforms({}, input_shape=64)
    ds = PanNukeDataset(root, folds=[0], transforms=val_tf)
    loader = DataLoader(
        ds, batch_size=8, sampler=RandomSampler(len(ds), seed=0), num_workers=2,
        drop_last=True,
    )
    model = tiny_cellvit()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    mesh = make_mesh()  # 8 virtual CPU devices on the data axis
    schedule = make_lr_schedule("constant", 1e-3, epochs=4, steps_per_epoch=1)
    tx = retrieve_optimizer("AdamW", {"lr": 1e-3, "weight_decay": 1e-4}, schedule)
    tissue_map = {t: i for i, t in enumerate(TISSUES)}
    trainer = CellViTTrainer(
        model=model,
        loss_fn_dict=DEFAULT_LOSSES,
        optimizer=tx,
        num_classes=6,
        tissue_types=tissue_map,
        mesh=mesh,
    )
    def make_state():
        return trainer.create_state(jax.tree_util.tree_map(jnp.copy, variables))

    return trainer, make_state, loader


def test_train_epoch_runs_and_loss_finite(setup):
    trainer, make_state, loader = setup
    state = make_state()
    state, scalars = trainer.train_epoch(state, loader, epoch=0, unfreeze_epoch=0)
    assert np.isfinite(scalars["Total_Loss"])
    assert {"dice", "jaccard", "tissue_acc"} <= set(scalars)
    assert int(state.step) == len(loader)


def test_loss_decreases_over_epochs(setup):
    trainer, make_state, loader = setup
    state = make_state()
    first = None
    for epoch in range(4):
        state, scalars = trainer.train_epoch(state, loader, epoch)
        if first is None:
            first = scalars["Total_Loss"]
    assert scalars["Total_Loss"] < first, (first, scalars["Total_Loss"])


def test_validation_epoch_with_pq(setup):
    trainer, make_state, loader = setup
    state = make_state()
    scalars, bpq = trainer.validation_epoch(state, loader, epoch=0, compute_pq=True)
    assert "bPQ" in scalars and 0.0 <= bpq <= 1.0
    assert np.isfinite(scalars["Total_Loss"])


def test_freeze_encoder_keeps_encoder_params(setup):
    trainer, make_state, loader = setup
    state = make_state()
    enc_before = jax.tree_util.tree_map(np.asarray, state.params["encoder"])
    dec_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["hv_map_decoder"])[0]
    ).copy()
    raw = next(iter(loader))
    batch = prepare_batch(raw, trainer.tissue_types)
    new_state, _ = trainer.train_step(
        state, batch, jax.random.PRNGKey(0), freeze_encoder=True
    )
    enc_after = jax.tree_util.tree_map(np.asarray, new_state.params["encoder"])
    # everything except the classifier head must be untouched
    for path, a in jax.tree_util.tree_leaves_with_path(enc_before):
        names = [getattr(p, "key", "") for p in path]
        b = a
        node = enc_after
        for n in names:
            node = node[n]
        if names[0] == "head":
            continue
        np.testing.assert_array_equal(node, a, err_msg=str(names))
    # decoders must have moved
    dec_after = np.asarray(
        jax.tree_util.tree_leaves(new_state.params["hv_map_decoder"])[0]
    )
    assert not np.allclose(dec_before, dec_after)


def test_checkpoint_roundtrip(tmp_path, setup):
    trainer, make_state, loader = setup
    state = make_state()
    state, _ = trainer.train_epoch(state, loader, epoch=0)
    ckpt.save_checkpoint(tmp_path / "latest", state, trainer, epoch=0)
    fresh = trainer.create_state(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    restored, meta = ckpt.load_checkpoint(tmp_path / "latest", fresh)
    assert meta["epoch"] == 0
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(state.step)
    )
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_orbax_checkpointing(tmp_path, setup):
    """fit(checkpoint_format='orbax'): per-epoch saves land in the manager,
    best-metric retention works, and restore resumes the step counter."""
    from cellvit_tpu.train.checkpoint_orbax import OrbaxCheckpointer

    trainer, make_state, loader = setup
    state = make_state()
    state = trainer.fit(
        state,
        epochs=2,
        train_loader=loader,
        val_loader=loader,
        checkpoint_dir=tmp_path,
        checkpoint_format="orbax",
        log_fn=lambda *_: None,
    )
    with OrbaxCheckpointer(tmp_path / "orbax", monitor="bPQ") as ck:
        assert ck.latest_step() == 1
        assert ck.best_step() is not None
        fresh = make_state()
        restored, meta = ck.restore(fresh)
    assert meta["epoch"] == 1
    assert int(restored.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_bad_checkpoint_format_raises(setup):
    trainer, make_state, loader = setup
    with pytest.raises(ValueError, match="checkpoint_format"):
        trainer.fit(
            make_state(), epochs=1, train_loader=loader, val_loader=loader,
            checkpoint_dir=Path("/tmp/x"), checkpoint_format="zarr",
            log_fn=lambda *_: None,
        )


def test_early_stopping():
    es = EarlyStopping(patience=2, strategy="maximize")
    assert es(0.5, 0)
    assert not es(0.4, 1)
    assert not es(0.3, 2)
    assert es.early_stop
    assert es.best_metric == 0.5 and es.best_epoch == 0


def test_lr_schedules():
    sched = make_lr_schedule("constant", 1.0, epochs=130, steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert float(sched(25 * 10)) == pytest.approx(0.1)
    assert float(sched(60 * 10)) == pytest.approx(1.0)
    assert float(sched(100 * 10)) == pytest.approx(0.1)
    exp = make_lr_schedule("exponential", 1.0, 130, 1, gamma=0.5)
    assert float(exp(3)) == pytest.approx(0.125)
    cos = make_lr_schedule("cosine", 1.0, 100, 1, eta_min=0.0)
    assert float(cos(0)) == pytest.approx(1.0)
    assert float(cos(50)) == pytest.approx(0.5, abs=1e-6)


def test_plotting_examples(tmp_path, setup):
    import matplotlib

    matplotlib.use("Agg")
    from cellvit_tpu.utils.plotting import generate_example_image

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    inst = np.zeros((2, 64, 64), np.int32)
    inst[:, 10:20, 10:20] = 1
    out = tmp_path / "examples" / "epoch_000.png"
    generate_example_image(
        imgs, inst, inst, (inst > 0).astype(np.int32), (inst > 0).astype(np.int32),
        hv_pred=rng.uniform(-1, 1, (2, 64, 64, 2)).astype(np.float32),
        hv_gt=rng.uniform(-1, 1, (2, 64, 64, 2)).astype(np.float32),
        outfile=out,
    )
    assert out.exists() and out.stat().st_size > 1000


def test_new_optimizers_match_torch():
    """Rprop / ASGD / SparseAdam / LBFGS trajectories vs torch."""
    import jax
    import jax.numpy as jnp
    import torch

    x0 = np.array([1.5, -2.0, 0.3, 4.0], np.float32)

    def torch_traj(opt_cls, steps=6, **kw):
        p = torch.nn.Parameter(torch.from_numpy(x0.copy()))
        opt = opt_cls([p], **kw)
        for _ in range(steps):
            opt.zero_grad()
            loss = ((p - 1.0) ** 2).sum() + 0.1 * (p ** 4).sum()
            loss.backward()
            opt.step()
        return p.detach().numpy()

    def jax_traj(name, steps=6, **hp):
        schedule = make_lr_schedule("none", hp.get("lr", 1e-2), 10, 1)
        tx = retrieve_optimizer(name, dict(hp), schedule)
        params = jnp.asarray(x0)
        state = tx.init(params)
        grad_fn = jax.grad(
            lambda p: jnp.sum((p - 1.0) ** 2) + 0.1 * jnp.sum(p ** 4)
        )
        for _ in range(steps):
            g = grad_fn(params)
            upd, state = tx.update(g, state, params)
            params = params + upd
        return np.asarray(params)

    np.testing.assert_allclose(
        jax_traj("Rprop", lr=0.01),
        torch_traj(torch.optim.Rprop, lr=0.01),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        jax_traj("ASGD", lr=0.05, lambd=1e-2, alpha=0.75),
        torch_traj(torch.optim.ASGD, lr=0.05, lambd=1e-2, alpha=0.75),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        jax_traj("SparseAdam", lr=0.01),
        torch_traj(torch.optim.Adam, lr=0.01),  # dense grads: SparseAdam ≡ Adam
        rtol=1e-4,
    )
    # LBFGS has no line-for-line torch parity (line search replaced by the
    # LR schedule) — check it optimizes
    out = jax_traj("LBFGS", lr=0.1, history_size=5, steps=20)
    base = float(np.sum((x0 - 1) ** 2) + 0.1 * np.sum(x0 ** 4))
    final = float(np.sum((out - 1) ** 2) + 0.1 * np.sum(out ** 4))
    assert final < base * 0.2


def test_weight_decay_matches_torch_for_all_optimizers():
    """Coupled L2 weight decay parity (torch adds wd·param to the gradient
    before adaptive scaling) for every registry entry that supports it."""
    import jax
    import jax.numpy as jnp
    import torch

    x0 = np.array([1.5, -2.0, 0.3, 4.0], np.float32)

    def torch_traj(opt_cls, steps=5, **kw):
        p = torch.nn.Parameter(torch.from_numpy(x0.copy()))
        opt = opt_cls([p], **kw)
        for _ in range(steps):
            opt.zero_grad()
            ((p - 1.0) ** 2).sum().backward()
            opt.step()
        return p.detach().numpy()

    def jax_traj(name, steps=5, **hp):
        schedule = make_lr_schedule("none", hp.get("lr", 1e-2), 10, 1)
        tx = retrieve_optimizer(name, dict(hp), schedule)
        params = jnp.asarray(x0)
        state = tx.init(params)
        grad_fn = jax.grad(lambda p: jnp.sum((p - 1.0) ** 2))
        for _ in range(steps):
            upd, state = tx.update(grad_fn(params), state, params)
            params = params + upd
        return np.asarray(params)

    wd = 0.1
    cases = [
        ("RMSprop", torch.optim.RMSprop, dict(lr=0.01)),
        ("RAdam", torch.optim.RAdam, dict(lr=0.01)),
        ("Adagrad", torch.optim.Adagrad, dict(lr=0.05)),
        ("Adadelta", torch.optim.Adadelta, dict(lr=0.5)),
        ("Adamax", torch.optim.Adamax, dict(lr=0.01)),
        ("Adam", torch.optim.Adam, dict(lr=0.01)),
        ("SGD", torch.optim.SGD, dict(lr=0.05, momentum=0.9)),
    ]
    for name, opt_cls, hp in cases:
        got = jax_traj(name, weight_decay=wd, **hp)
        want = torch_traj(opt_cls, weight_decay=wd, **hp)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6, err_msg=name)
