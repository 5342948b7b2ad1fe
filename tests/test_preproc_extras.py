"""Annotation subsystem, tissue detector, macenko, context patches."""

import json
from pathlib import Path

import numpy as np
import pytest


def test_annotation_parsing_geojson(tmp_path):
    from cellvit_tpu.preprocessing.annotations import load_annotations

    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [100, 0], [100, 100], [0, 100]]],
                },
                "properties": {"classification": {"name": "tumor"}},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [[[200, 200], [250, 200], [250, 250]]],
                        [[[300, 300], [350, 300], [350, 350]]],
                    ],
                },
                "properties": {"classification": {"name": "stroma"}},
            },
        ],
    }
    p = tmp_path / "slide.geojson"
    p.write_text(json.dumps(gj))
    polys, labels = load_annotations(p)
    assert len(polys) == 3
    assert labels == ["tumor", "stroma", "stroma"]


def test_annotation_parsing_asap_xml(tmp_path):
    from cellvit_tpu.preprocessing.annotations import load_annotations

    xml = """<?xml version="1.0"?>
    <ASAP_Annotations><Annotations>
      <Annotation Name="a1" PartOfGroup="tumor" Type="Polygon">
        <Coordinates>
          <Coordinate Order="0" X="10" Y="10"/>
          <Coordinate Order="1" X="50" Y="10"/>
          <Coordinate Order="2" X="50" Y="50"/>
        </Coordinates>
      </Annotation>
    </Annotations></ASAP_Annotations>"""
    p = tmp_path / "slide.xml"
    p.write_text(xml)
    polys, labels = load_annotations(p)
    assert len(polys) == 1 and labels == ["tumor"]
    assert polys[0].shape == (3, 2)


def test_intersected_labels():
    from cellvit_tpu.preprocessing.annotations import get_intersected_labels

    label_map = {"background": 0, "tumor": 1, "stroma": 2}
    square = np.array([[0, 0], [128, 0], [128, 128], [0, 128]], np.float64)
    labels, ratios, mask = get_intersected_labels(
        tile_size=256, patch_overlap=0, row=0, col=0, label_map=label_map,
        polygons=[square], region_labels=["tumor"], store_masks=True,
    )
    assert labels == [1]
    assert 0.2 < ratios[0] < 0.3  # 128² / 256² ≈ 0.25
    assert mask is not None and (mask == 1).sum() > 0
    # patch far away → no labels
    labels2, _, _ = get_intersected_labels(
        tile_size=256, patch_overlap=0, row=5, col=5, label_map=label_map,
        polygons=[square], region_labels=["tumor"],
    )
    assert labels2 == []


def test_macenko_normalization(rng):
    from cellvit_tpu.preprocessing.macenko import (
        fit_normalization_vectors,
        macenko_normalization,
    )

    # synthetic H&E-ish patches: two stain directions + noise
    stains = np.array([[0.65, 0.07], [0.70, 0.99], [0.29, 0.11]])
    sats = rng.uniform(0, 1.5, (2, 64 * 64))
    od = stains @ sats
    rgb = (255 * np.exp(-od.T)).reshape(64, 64, 3).astype(np.uint8)
    out, vectors, max_sat = macenko_normalization([rgb])
    assert out[0].shape == rgb.shape and out[0].dtype == np.uint8
    assert vectors.shape == (3, 2)
    assert max_sat.shape == (2, 1)


def test_tissue_detector_train_filter(tmp_path, rng):
    from cellvit_tpu.preprocessing.tissue_detector import (
        filter_patches,
        train_tissue_detector,
    )

    # trainable separation: tissue = dark, background = bright
    imgs = np.zeros((64, 32, 32, 3), np.float32)
    labels = np.zeros(64, np.int64)
    imgs[::2] = rng.uniform(0.0, 0.3, (32, 32, 32, 3))
    labels[::2] = 3
    imgs[1::2] = rng.uniform(0.7, 1.0, (32, 32, 32, 3))
    labels[1::2] = 1
    ckpt = tmp_path / "tissue.msgpack"
    acc = train_tissue_detector(imgs, labels, ckpt, epochs=12, batch_size=16)
    assert acc > 0.9

    # fake preprocessed WSI dir: 2 tissue + 2 background patches
    from PIL import Image

    wsi_dir = tmp_path / "wsi"
    (wsi_dir / "patches").mkdir(parents=True)
    entries = []
    for i, dark in enumerate([True, True, False, False]):
        arr = (
            rng.uniform(0.0, 0.3, (32, 32, 3))
            if dark else rng.uniform(0.7, 1.0, (32, 32, 3))
        )
        name = f"p_{i}.png"
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            wsi_dir / "patches" / name
        )
        entries.append({name: {"row": 0, "col": i}})
    (wsi_dir / "patch_metadata.json").write_text(json.dumps(entries))

    stats = filter_patches(wsi_dir, ckpt, batch_size=4)
    assert stats["kept"] == 2 and stats["dropped"] == 2
    kept = json.loads((wsi_dir / "patch_metadata.json").read_text())
    assert {next(iter(e)) for e in kept} == {"p_0.png", "p_1.png"}
