"""Data layer tests: label engineering, datasets, sampling, loader, transforms."""

import numpy as np
import pytest

from cellvit_tpu.data import labels as L
from tests.synth import make_pannuke_dataset, random_instance_image


# ---------------------------------------------------------------- labels


def _stardist_reference(inst_map, n_rays=8):
    """Direct per-pixel ray march (the documented algorithm, unvectorized)."""
    h, w = inst_map.shape
    dist = np.zeros((h, w, n_rays), np.float32)
    st = 2 * np.pi / n_rays
    for i in range(h):
        for j in range(w):
            v = inst_map[i, j]
            if v == 0:
                continue
            for k in range(n_rays):
                phi = np.float32(k * st)
                dy, dx = np.cos(phi), np.sin(phi)
                x = y = np.float32(0)
                while True:
                    x += dx
                    y += dy
                    ii = int(np.floor(i + x + 0.5))
                    jj = int(np.floor(j + y + 0.5))
                    if ii < 0 or ii >= h or jj < 0 or jj >= w or inst_map[ii, jj] != v:
                        t_corr = 1 - 0.5 / max(abs(dx), abs(dy))
                        x -= t_corr * dx
                        y -= t_corr * dy
                        dist[i, j, k] = np.sqrt(x * x + y * y)
                        break
    return dist


def test_hv_map_properties(rng):
    _, inst, _ = random_instance_image(rng)
    hv = L.gen_instance_hv_map(inst)
    assert hv.shape == inst.shape + (2,)
    assert np.abs(hv).max() <= 1.0 + 1e-6
    assert (hv[inst == 0] == 0).all()
    # each sufficiently large instance spans the whole gradient range
    for i in np.unique(inst)[1:]:
        sel = inst == i
        if sel.sum() > 30:
            assert hv[sel, 0].min() < -0.9 and hv[sel, 0].max() > 0.9


def test_stardist_vectorized_matches_direct(rng):
    _, inst, _ = random_instance_image(rng, h=32, w=32, n_cells=3)
    ref = _stardist_reference(inst, n_rays=8)
    out = L.gen_stardist_maps(inst, n_rays=8)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_distance_prob_map(rng):
    _, inst, _ = random_instance_image(rng)
    d = L.gen_distance_prob_maps(inst)
    assert d.min() >= 0 and d.max() <= 1.0
    assert (d[inst == 0] == 0).all()
    assert (d[inst > 0] > 0).all()


def test_regression_map_zero_at_center(rng):
    _, inst, _ = random_instance_image(rng)
    reg = L.gen_regression_map(inst)
    assert reg.shape == inst.shape + (2,)
    assert np.abs(reg).max() > 0


def test_fix_duplicates():
    m = np.zeros((20, 20), np.int32)
    m[2:5, 2:5] = 1
    m[10:13, 10:13] = 1  # same id, disconnected
    out = L.fix_duplicates(m.copy())
    assert len(np.unique(out)) == 3  # bg + 2 ids


# ---------------------------------------------------------------- datasets


@pytest.fixture(scope="module")
def pannuke_root(tmp_path_factory):
    return make_pannuke_dataset(
        tmp_path_factory.mktemp("pannuke"), folds=(0, 1), n_images=6
    )


def test_pannuke_dataset_basic(pannuke_root):
    from cellvit_tpu.data.datasets import PanNukeDataset

    ds = PanNukeDataset(pannuke_root, folds=[0, 1], stardist=True, regression=True)
    assert len(ds) == 12
    img, masks, tissue, name = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert img.max() <= 1.0
    assert masks["hv_map"].shape == (64, 64, 2)
    assert masks["stardist_map"].shape == (64, 64, 32)
    assert masks["dist_map"].shape == (64, 64)
    assert masks["regression_map"].shape == (64, 64, 2)
    assert tissue in ("Breast", "Colon", "Lung")


def test_sampling_weights(pannuke_root):
    from cellvit_tpu.data.datasets import PanNukeDataset

    ds = PanNukeDataset(pannuke_root, folds=[0])
    tw = ds.get_sampling_weights_tissue(gamma=1.0)
    assert tw.shape == (6,) and (tw > 0).all()
    ds.load_cell_count()
    cw = ds.get_sampling_weights_cell(gamma=1.0)
    assert cw.shape == (6,) and (cw > 0).all()
    both = ds.get_sampling_weights_cell_tissue(gamma=0.5)
    assert both.shape == (6,)
    # gamma=0 tissue weights are uniform
    t0 = ds.get_sampling_weights_tissue(gamma=0.0)
    assert np.allclose(t0, t0[0])


def test_dataloader_batches(pannuke_root):
    from cellvit_tpu.data.datasets import PanNukeDataset
    from cellvit_tpu.data.loader import DataLoader, RandomSampler, get_sampler

    ds = PanNukeDataset(pannuke_root, folds=[0, 1])
    dl = DataLoader(ds, batch_size=4, sampler=RandomSampler(len(ds), seed=1),
                    num_workers=3)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (4, 64, 64, 3)
    assert batches[0]["masks/hv_map"].shape == (4, 64, 64, 2)
    assert len(batches[0]["tissue_types"]) == 4

    # weighted sampler draws len(dataset) samples
    ws = get_sampler(ds, strategy="cell", gamma=1.0, seed=0)
    assert len(list(iter(ws))) == len(ds)


def test_dataloader_propagates_errors(pannuke_root):
    from cellvit_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    dl = DataLoader(Bad(), batch_size=2, collate_fn=lambda s: s)
    with pytest.raises(RuntimeError):
        list(dl)


# ---------------------------------------------------------------- transforms


def test_transforms_pipeline(rng):
    from cellvit_tpu.data.transforms import build_transforms

    settings = {
        "randomrotate90": {"p": 1.0},
        "horizontalflip": {"p": 1.0},
        "downscale": {"p": 1.0, "scale": 0.5},
        "blur": {"p": 1.0, "blur_limit": 7},
        "gaussnoise": {"p": 1.0, "var_limit": 30},
        "colorjitter": {"p": 1.0, "scale_setting": 0.25, "scale_color": 0.1},
        "superpixels": {"p": 1.0},
        "zoomblur": {"p": 1.0},
        "randomsizedcrop": {"p": 1.0},
        "elastictransform": {"p": 1.0},
        "normalize": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]},
    }
    train_tf, val_tf = build_transforms(settings, input_shape=64, seed=0)
    img, inst, typ = random_instance_image(rng)
    mask = np.stack([inst, typ], axis=-1)
    out_img, out_mask = train_tf(img, mask)
    assert out_img.shape == (64, 64, 3)
    assert out_mask.shape == (64, 64, 2)
    assert out_img.dtype == np.float32
    # labels survive as integers
    assert set(np.unique(out_mask[..., 0])) <= set(np.unique(inst))

    vimg, vmask = val_tf(img, mask)
    np.testing.assert_allclose(vimg, img.astype(np.float32) / 255 * 2 - 1, atol=1e-5)
    np.testing.assert_array_equal(vmask, mask)


def test_transforms_geometry_keeps_pairing(rng):
    """Geometric ops must move image and mask together."""
    from cellvit_tpu.data.transforms import Compose, RandomRotate90

    img, inst, typ = random_instance_image(rng)
    mask = np.stack([inst, typ], axis=-1)
    tf = Compose([RandomRotate90(1.0)], seed=3)
    out_img, out_mask = tf(img, mask)
    # nucleus pixels are darker; rotated positions must still align
    sel = out_mask[..., 0] > 0
    assert out_img[sel].mean() < out_img[~sel].mean()
