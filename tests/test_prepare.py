"""Dataset preparation script tests."""

import numpy as np
import pytest


def test_masks_to_inst_type(rng):
    from cellvit_tpu.data.prepare import masks_to_inst_type

    mask = np.zeros((64, 64, 6), np.float64)
    mask[5:15, 5:15, 0] = 7  # neoplastic instance id 7
    mask[30:40, 30:40, 2] = 3  # connective instance id 3
    label = masks_to_inst_type(mask)
    inst, types = label["inst_map"], label["type_map"]
    assert set(np.unique(inst)) == {0, 1, 2}
    assert set(np.unique(types)) == {0, 1, 3}
    assert (types[inst == 1] == 1).all()
    assert (types[inst == 2] == 3).all()


def test_prepare_pannuke_roundtrip(tmp_path, rng):
    from cellvit_tpu.data.datasets import PanNukeDataset
    from cellvit_tpu.data.prepare import prepare_pannuke

    # original-layout fixture
    src = tmp_path / "orig" / "fold0"
    src.mkdir(parents=True)
    n = 3
    images = rng.integers(0, 255, (n, 64, 64, 3), dtype=np.uint8)
    masks = np.zeros((n, 64, 64, 6))
    for i in range(n):
        masks[i, 10:20, 10:20, i % 5] = 1
    types = np.array(["Breast", "Colon", "Breast"])
    np.save(src / "images.npy", images)
    np.save(src / "masks.npy", masks)
    np.save(src / "types.npy", types)

    out = tmp_path / "prepared"
    prepare_pannuke(tmp_path / "orig", out, folds=(0,))

    assert (out / "dataset_config.yaml").exists()
    assert (out / "weight_config.yaml").exists()
    ds = PanNukeDataset(out, folds=[0])
    assert len(ds) == n
    img, masks_out, tissue, name = ds[0]
    assert img.shape == (64, 64, 3)
    assert masks_out["instance_map"].max() == 1
    ds.load_cell_count()
    assert ds.cell_count.shape == (n, 5)


def test_prepare_monuseg(tmp_path):
    from cellvit_tpu.data.datasets import MoNuSegDataset
    from cellvit_tpu.data.prepare import prepare_monuseg
    from PIL import Image

    src = tmp_path / "orig"
    (src / "Tissue Images").mkdir(parents=True)
    (src / "Annotations").mkdir(parents=True)
    img = np.full((64, 64, 3), 200, np.uint8)
    Image.fromarray(img).save(src / "Tissue Images" / "img1.tif")
    xml = """<?xml version="1.0"?><Annotations>
      <Annotation><Coordinates>
        <Coordinate X="10" Y="10"/><Coordinate X="30" Y="10"/>
        <Coordinate X="30" Y="30"/><Coordinate X="10" Y="30"/>
      </Coordinates></Annotation></Annotations>"""
    (src / "Annotations" / "img1.xml").write_text(xml)

    out = tmp_path / "prepared"
    prepare_monuseg(src, out)
    ds = MoNuSegDataset(out)
    assert len(ds) == 1
    img_out, mask, name = ds[0]
    # everything is resized to 1024 (reference prepare_monuseg.py:20-87),
    # so the 64-px source scales 16×: the polygon interior moves with it
    assert img_out.shape[:2] == (1024, 1024)
    assert mask.shape[:2] == (1024, 1024)
    assert mask[..., 0].max() == 1
    scale = 1024 / 64
    assert mask[int(15 * scale), int(15 * scale), 0] == 1
    assert mask[int(5 * scale), int(5 * scale), 0] == 0
