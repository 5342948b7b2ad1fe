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


def test_full_config_fields(tmp_path, rng):
    """Extended reference-schema config fields drive real behavior:
    wsi_filelist csv, level override, tissue_annotation masking,
    save_only_annotated_patches, overlapping_labels mask stacks."""
    import json as _json

    import yaml

    from cellvit_tpu.preprocessing.patch_extraction import (
        PreProcessingConfig,
        PreProcessor,
    )
    from cellvit_tpu.preprocessing.wsi_reader import write_test_pyramid

    img = np.full((768, 768, 3), 235, np.uint8)
    img[100:500, 100:500] = (150, 90, 160)  # tissue block
    slide = tmp_path / "s1.tiff"
    write_test_pyramid(str(slide), img, tile_size=128, n_levels=2,
                       mpp=0.5, magnification=20)

    # filelist csv with per-file metadata override
    filelist = tmp_path / "files.csv"
    filelist.write_text(f"path,slide_mpp,magnification\n{slide},0.5,20\n")

    # annotations: tissue region + two overlapping tumor/stroma squares
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    def feat(name, coords):
        return {"type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [coords]},
                "properties": {"classification": {"name": name}}}
    (ann_dir / "s1.geojson").write_text(_json.dumps({
        "type": "FeatureCollection",
        "features": [
            feat("tissue", [[90, 90], [510, 90], [510, 510], [90, 510]]),
            feat("tumor", [[120, 120], [380, 120], [380, 380], [120, 380]]),
            feat("stroma", [[250, 250], [470, 250], [470, 470], [250, 470]]),
            feat("ignore_me", [[0, 0], [50, 0], [50, 50]]),
        ],
    }))
    label_map_file = tmp_path / "labels.json"
    label_map_file.write_text(_json.dumps(
        {"background": 0, "tumor": 1, "stroma": 2}))

    out = tmp_path / "out"
    config = PreProcessingConfig(
        output_path=str(out),
        wsi_filelist=str(filelist),
        patch_size=256,
        level=0,
        check_resolution=20,
        annotation_paths=str(ann_dir),
        label_map_file=str(label_map_file),
        tissue_annotation="tissue",
        tissue_annotation_intersection_ratio=0.05,
        exclude_classes=("ignore_me",),
        save_only_annotated_patches=True,
        store_masks=True,
        overlapping_labels=True,
        generate_thumbnails=True,
        adjust_brightness=True,
        min_intersection_ratio=0.05,
        processes=2,
        log_level="warning",
    )
    assert config.label_map == {"background": 0, "tumor": 1, "stroma": 2}
    pre = PreProcessor(config)
    assert pre.files == [slide]
    pre.sample_patches_dataset()

    patched = out / "s1"
    entries = _json.loads((patched / "patch_metadata.json").read_text())
    assert entries, "annotated patches should survive the filters"
    # every kept patch carries at least one intersected label
    for e in entries:
        meta = next(iter(e.values()))
        assert meta["intersected_labels"]
    # overlapping_labels → per-label channel stack masks
    masks = sorted((patched / "annotation_masks").glob("*.npy"))
    assert masks
    m = np.load(masks[0])
    assert m.ndim == 3 and m.shape[:2] == (256, 256)
    assert m.shape[2] == len(
        next(iter(entries[0].values()))["intersected_labels"])
    assert (patched / "thumbnails" / "thumbnail_ds_32.png").exists()

    # strict resolution guard trips on mismatch
    bad = PreProcessingConfig(
        output_path=str(tmp_path / "out2"), wsi_paths=str(slide),
        wsi_extension="tiff", check_resolution=40, level=0,
    )
    with pytest.raises(RuntimeError, match="magnification"):
        PreProcessor(bad).process_wsi(slide)

    # missing annotation file: strict vs incomplete_annotations
    slide2 = tmp_path / "s2.tiff"
    write_test_pyramid(str(slide2), img, tile_size=128, n_levels=2,
                       mpp=0.5, magnification=20)
    strict = PreProcessingConfig(
        output_path=str(tmp_path / "out3"), wsi_paths=str(slide2),
        wsi_extension="tiff", annotation_paths=str(ann_dir),
    )
    with pytest.raises(FileNotFoundError):
        PreProcessor(strict).process_wsi(slide2)
    lax = PreProcessingConfig(
        output_path=str(tmp_path / "out4"), wsi_paths=str(slide2),
        wsi_extension="tiff", annotation_paths=str(ann_dir),
        incomplete_annotations=True, min_intersection_ratio=0.05,
    )
    res = PreProcessor(lax).process_wsi(slide2)
    assert res["n_patches"] > 0


def test_polygon_overview(tmp_path):
    from cellvit_tpu.preprocessing.plotting import generate_polygon_overview

    thumb = np.full((200, 300, 3), 220, np.uint8)
    polys = [
        np.array([[100, 100], [900, 100], [900, 500], [100, 500]], float),
        np.array([[1000, 600], [1400, 600], [1400, 780]], float),
    ]
    labels = ["tumor", "stroma"]
    out = generate_polygon_overview(
        polys, labels, {"background": 0, "tumor": 1, "stroma": 2},
        thumb, downsample=5.0,
    )
    assert set(out) == {
        "tumor", "tumor_clean", "stroma", "stroma_clean", "all_overlays"
    }
    # tumor overlay changes exactly the tumor region of the thumbnail
    diff = (out["tumor"].astype(int) - thumb.astype(int)).any(axis=-1)
    assert diff[60, 100] and not diff[10, 10]
    # clean canvas is white outside annotations
    assert (out["tumor_clean"][10, 10] == 255).all()
    # combined overlay shows both
    dall = (out["all_overlays"].astype(int) - thumb.astype(int)).any(axis=-1)
    assert dall[60, 100] and dall[130, 240]


def test_native_reader_skips_stripped_thumbnail(tmp_path, rng):
    """Aperio SVS interleaves stripped thumbnail directories with the same
    aspect as the slide; pyramid enumeration must admit only TILED
    directories (OpenSlide semantics) so level indices stay stable."""
    from cellvit_tpu.preprocessing.wsi_reader import NativeWSIReader, write_test_pyramid

    img = (rng.uniform(0, 255, (256, 256, 3))).astype(np.uint8)
    plain = tmp_path / "plain.svs"
    with_thumb = tmp_path / "thumb.svs"
    write_test_pyramid(str(plain), img, tile_size=64, n_levels=3)
    write_test_pyramid(
        str(with_thumb), img, tile_size=64, n_levels=3,
        insert_stripped_thumbnail=True,
    )
    a = NativeWSIReader(plain)
    b = NativeWSIReader(with_thumb)
    assert b.level_count == a.level_count == 3
    assert b.level_dimensions == a.level_dimensions
    assert b.level_downsamples == a.level_downsamples
    # and the pixel payloads of each level agree
    ra = a.read_region((0, 0), 1, (64, 64))
    rb = b.read_region((0, 0), 1, (64, 64))
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


def test_native_reader_aperio_j2k_rgb(tmp_path, rng):
    """Aperio 33005 (JPEG2000 RGB) slides decode through the runtime-loaded
    libopenjp2 path; lossless fixture tiles must round-trip exactly,
    including crops crossing tile boundaries and the downsampled level."""
    from cellvit_tpu.preprocessing.wsi_reader import (
        APERIO_J2K_RGB,
        NativeWSIReader,
        write_test_j2k_pyramid,
        _load_library,
    )

    if not _load_library().wsi_has_jpeg2000():
        import pytest

        pytest.skip("libopenjp2 not available")

    img = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
    path = tmp_path / "j2k.svs"
    write_test_j2k_pyramid(str(path), img, tile_size=64, compression=APERIO_J2K_RGB)
    r = NativeWSIReader(path)
    assert r.level_count == 2
    assert r.level_compression(0) == APERIO_J2K_RGB
    np.testing.assert_array_equal(r.read_region((0, 0), 0, (300, 200)), img)
    # tile-boundary-crossing crop
    np.testing.assert_array_equal(
        r.read_region((70, 50), 0, (100, 90)), img[50:140, 70:170]
    )
    assert r.level_dimensions[1] == (150, 100)
    r.close()


def test_native_reader_aperio_j2k_ycbcr(tmp_path, rng):
    """Aperio 33003 codestreams carry YCbCr planes; the reader must apply
    the BT.601 full-range inverse (OpenSlide semantics) — round trip within
    conversion rounding."""
    from cellvit_tpu.preprocessing.wsi_reader import (
        APERIO_J2K_YCBCR,
        NativeWSIReader,
        write_test_j2k_pyramid,
        _load_library,
    )

    if not _load_library().wsi_has_jpeg2000():
        import pytest

        pytest.skip("libopenjp2 not available")

    img = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
    path = tmp_path / "j2k_ycc.svs"
    write_test_j2k_pyramid(
        str(path), img, tile_size=64, compression=APERIO_J2K_YCBCR, n_levels=1
    )
    r = NativeWSIReader(path)
    got = r.read_region((0, 0), 0, (128, 128))
    d = np.abs(got.astype(int) - img.astype(int))
    assert d.max() <= 2, d.max()
    r.close()


def test_native_reader_rejects_nontiff_vendor_formats(tmp_path):
    """vms/vmu (reference WSI_EXT, configs/python/config.py:10-19) are
    multi-file containers needing OpenSlide vendor drivers — open_slide
    must fail with a clear message, not a parse error. (.bif is now read
    natively — tests/test_wsi_formats.py::TestBif — so a corrupt one
    fails the open with an explicit IOError instead.)"""
    import pytest

    from cellvit_tpu.preprocessing.wsi_reader import open_slide

    for suffix in (".vms", ".vmu"):
        p = tmp_path / f"slide{suffix}"
        p.write_bytes(b"\0" * 16)
        with pytest.raises(NotImplementedError, match="OpenSlide"):
            open_slide(str(p))
    p = tmp_path / "slide.bif"
    p.write_bytes(b"\0" * 16)
    with pytest.raises(IOError):
        open_slide(str(p))
