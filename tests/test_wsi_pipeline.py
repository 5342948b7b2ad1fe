"""WSI pipeline end-to-end: synthetic slide → preprocessing → detection →
dedup → exports."""

import json
from pathlib import Path

import numpy as np
import pytest

from cellvit_tpu.inference import dedup as dd


# ---------------------------------------------------------------- helpers


def synth_slide(rng, w=1600, h=1200, n_cells=120):
    """H&E-like slide: light background, dark nuclei blobs; returns
    (rgb, centers)."""
    img = np.full((h, w, 3), 235, np.uint8)
    # tissue region occupies the middle portion
    img[:, : w // 8] = 255
    img[:, -w // 8 :] = 255
    yy, xx = np.mgrid[0:h, 0:w]
    tissue = (xx > w // 8) & (xx < w - w // 8)
    img[tissue] = (210, 160, 200)
    centers = []
    for _ in range(n_cells):
        cy = int(rng.integers(20, h - 20))
        cx = int(rng.integers(w // 8 + 20, w - w // 8 - 20))
        r = int(rng.integers(6, 11))
        sel = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        img[sel] = (80, 40, 120)
        centers.append((cx, cy, r))
    return img, centers


@pytest.fixture(scope="module")
def preprocessed_wsi(tmp_path_factory):
    from cellvit_tpu.preprocessing.patch_extraction import (
        PreProcessingConfig,
        PreProcessor,
    )
    from cellvit_tpu.preprocessing.wsi_reader import write_test_pyramid

    rng = np.random.default_rng(7)
    img, centers = synth_slide(rng)
    root = tmp_path_factory.mktemp("wsi")
    slide_path = root / "slide1.tiff"
    write_test_pyramid(str(slide_path), img, tile_size=128, n_levels=3,
                       mpp=0.25, magnification=40)
    out = root / "preprocessed"
    config = PreProcessingConfig(
        wsi_paths=str(slide_path),
        output_path=str(out),
        patch_size=256,
        patch_overlap=25,  # 32 px per side → 64 recorded, tile 192
        min_intersection_ratio=0.05,
        processes=4,
        wsi_extension="tiff",
    )
    PreProcessor(config).sample_patches_dataset()
    return slide_path, out / "slide1", img, centers


# ---------------------------------------------------------------- tests


def test_preprocessing_outputs(preprocessed_wsi):
    _, patched, img, _ = preprocessed_wsi
    assert (patched / "patch_metadata.json").exists()
    assert (patched / "metadata.yaml").exists()
    entries = json.loads((patched / "patch_metadata.json").read_text())
    assert len(entries) > 4
    import yaml

    meta = yaml.safe_load((patched / "metadata.yaml").read_text())
    assert meta["patch_size"] == 256
    assert meta["patch_overlap"] == 64
    assert meta["base_magnification"] == 40
    assert meta["base_mpp"] == 0.25
    # patches on disk decode and have content
    from PIL import Image

    name = next(iter(entries[0]))
    patch = np.array(Image.open(patched / "patches" / name))
    assert patch.shape == (256, 256, 3)


def test_preprocessing_resume(preprocessed_wsi):
    from cellvit_tpu.preprocessing.patch_extraction import (
        PreProcessingConfig,
        PreProcessor,
    )

    slide_path, patched, *_ = preprocessed_wsi
    config = PreProcessingConfig(
        wsi_paths=str(slide_path),
        output_path=str(patched.parent),
        patch_size=256,
        patch_overlap=25,
        wsi_extension="tiff",
    )
    results = PreProcessor(config).sample_patches_dataset()
    assert results == []  # resumed: nothing re-processed


def test_wsi_datamodel(preprocessed_wsi):
    from cellvit_tpu.data.wsi import WSI, PatchedWSIInference

    slide_path, patched, *_ = preprocessed_wsi
    wsi = WSI(
        name="slide1", patient="p1", slide_path=slide_path,
        patched_slide_path=patched,
    )
    assert wsi.get_number_patches() > 4
    ds = PatchedWSIInference(wsi)
    img, meta = ds[0]
    assert img.shape == (256, 256, 3) and img.dtype == np.float32
    assert "row" in meta and "col" in meta


def test_check_wsi_parameterized(preprocessed_wsi):
    """check_wsi accepts the geometry the slide was patched with (256²
    path, reference cell_detection_256.py) and rejects mismatches."""
    from cellvit_tpu.data.wsi import WSI
    from cellvit_tpu.inference.cell_detection import CellSegmentationInference

    slide_path, patched, *_ = preprocessed_wsi
    wsi = WSI(
        name="slide1", patient="p1", slide_path=slide_path,
        patched_slide_path=patched,
    )
    inf = CellSegmentationInference.__new__(CellSegmentationInference)
    mag = wsi.metadata["magnification"]
    inf.check_wsi(wsi, magnification=mag, patch_size=256, overlap=64)
    with pytest.raises(RuntimeError, match="patch size"):
        inf.check_wsi(wsi, magnification=mag, patch_size=1024, overlap=64)
    with pytest.raises(RuntimeError, match="overlap"):
        inf.check_wsi(wsi, magnification=mag, patch_size=256, overlap=128)
    with pytest.raises(RuntimeError, match="magnification"):
        inf.check_wsi(wsi, magnification=mag * 2, patch_size=256, overlap=64)


class OracleInference:
    """Analytic 'model' for pipeline tests: NP from darkness, HV from the
    GT generator — lets the device postproc reconstruct the blobs."""

    @staticmethod
    def forward(x_norm: np.ndarray):
        from scipy import ndimage

        from cellvit_tpu.data.labels import gen_instance_hv_map

        img = (x_norm * 0.5 + 0.5) * 255.0  # undo (x-.5)/.5 normalization
        dark = img.mean(-1) < 140
        b, h, w = dark.shape
        nb = np.zeros((b, h, w, 2), np.float32)
        hv = np.zeros((b, h, w, 2), np.float32)
        nt = np.zeros((b, h, w, 6), np.float32)
        nt[..., 0] = 8.0
        for i in range(b):
            lab, _ = ndimage.label(dark[i])
            nb[i, ..., 1] = np.where(dark[i], 8.0, -8.0)
            nb[i, ..., 0] = -nb[i, ..., 1]
            hv[i] = gen_instance_hv_map(lab)
            nt[i][dark[i], 0] = -8.0
            nt[i][dark[i], 1] = 8.0
        return nb, hv, nt


@pytest.fixture(scope="module")
def detection_run(preprocessed_wsi):
    import jax.numpy as jnp

    from cellvit_tpu.data.wsi import WSI
    from cellvit_tpu.inference.cell_detection import CellSegmentationInference

    slide_path, patched, *_ = preprocessed_wsi
    wsi = WSI(
        name="slide1", patient="p1", slide_path=slide_path,
        patched_slide_path=patched,
    )
    inf = CellSegmentationInference.__new__(CellSegmentationInference)
    from cellvit_tpu.utils.logger import Logger

    inf.logger = Logger(level="WARNING").create_logger()
    inf.batch_size = 4
    inf.max_instances = 512
    inf.mesh = None
    inf.mean = np.array([0.5, 0.5, 0.5], np.float32)
    inf.std = np.array([0.5, 0.5, 0.5], np.float32)
    inf.num_nuclei_classes = 6
    inf.run_conf = {"data": {"num_nuclei_classes": 6}}

    class FakeModel:
        patch_size = 16

    inf.model = FakeModel()

    def forward(variables, x):
        nb, hv, nt = OracleInference.forward(np.asarray(x))
        b, h, w, _ = nb.shape
        return {
            "nuclei_binary_map": jnp.asarray(nb),
            "hv_map": jnp.asarray(hv),
            "nuclei_type_map": jnp.asarray(nt),
            "tissue_types": jnp.zeros((b, 3)),
            "tokens": jnp.zeros((b, h // 16, w // 16, 8)),
        }

    inf.variables = {}
    inf._forward = forward
    outdir = inf.process_wsi(
        wsi, patch_size=256, overlap=64, geojson=True,
        profile_dir=patched / "trace",
    )
    return wsi, outdir


def test_detection_outputs_valid(detection_run):
    _, outdir = detection_run
    cells = json.loads((outdir / "cells.json").read_text())
    assert cells["cells"], "no cells detected"
    cell = cells["cells"][0]
    for key in ("bbox", "centroid", "contour", "type", "type_prob",
                "cell_status", "patch_coordinates", "edge_position"):
        assert key in cell
    det = json.loads((outdir / "cell_detection.json").read_text())
    assert len(det["cells"]) == len(cells["cells"])
    gj = json.loads((outdir / "cells.geojson").read_text())
    assert gj and gj[0]["geometry"]["type"] == "MultiPolygon"
    assert (outdir / "cells.pt").exists()


def test_detection_emits_timings_and_trace(detection_run):
    """SURVEY §5 observability: process_wsi writes per-stage wall timings
    and (with profile_dir) a jax.profiler device trace."""
    wsi, outdir = detection_run
    timings = json.loads((outdir / "timings.json").read_text())
    stages = timings["stages_s"]
    for key in ("patch_load", "device_forward_postproc", "host_assembly",
                "dedup", "serialize"):
        assert key in stages and stages[key] >= 0.0, key
    assert timings["n_patches"] > 0
    trace_dir = wsi.patched_slide_path / "trace"
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz (or .xplane.pb)
    assert any(trace_dir.rglob("*.*")), "no profiler trace artifacts"


def test_detection_recovers_cells_once(detection_run):
    """Each synthetic nucleus appears ~once after dedup (overlap regions
    would double-count without it)."""
    wsi, outdir = detection_run
    cells = json.loads((outdir / "cells.json").read_text())["cells"]
    centroids = np.array([c["centroid"] for c in cells])
    # no two surviving centroids closer than a few px (duplicates removed)
    from scipy.spatial.distance import pdist

    if len(centroids) > 1:
        assert pdist(centroids).min() > 3.0


def test_margin_and_edge_helpers():
    bbox_mid = np.array([[500, 500], [520, 520]])
    assert dd.get_cell_position_margin(bbox_mid, 1024, 64) == 0
    bbox_tl = np.array([[10, 10], [30, 30]])
    assert dd.get_cell_position_margin(bbox_tl, 1024, 64) == 1
    bbox_top = np.array([[10, 500], [30, 520]])
    assert dd.get_cell_position_margin(bbox_top, 1024, 64) == 2
    bbox_right = np.array([[500, 990], [520, 1024]])
    assert dd.get_cell_position_margin(bbox_right, 1024, 64) == 4

    bbox_border = np.array([[0, 500], [20, 520]])
    assert dd.get_cell_position(bbox_border, 1024) == [1, 0, 0, 0]
    assert dd.get_edge_patch([1, 0, 0, 0], 5, 7) == [[4, 7]]
    assert dd.get_edge_patch([0, 1, 1, 0], 5, 7) == [[5, 8], [6, 8], [6, 7]]


def test_dedup_removes_duplicates():
    sq = lambda x, y, s: np.array(
        [[x, y], [x + s, y], [x + s, y + s], [x, y + s]]
    )

    def cell(contour, status, patch, edge=False):
        return {
            "contour": contour.tolist(),
            "cell_status": status,
            "patch_coordinates": patch,
            "edge_position": edge,
        }

    cells = [
        cell(sq(10, 10, 20), 1, [0, 0]),       # margin cell, patch (0,0)
        cell(sq(12, 12, 24), 1, [0, 1]),       # overlapping duplicate, larger
        cell(sq(500, 500, 20), 0, [1, 1]),     # mid cell — always kept
        cell(sq(300, 300, 15), 2, [0, 0]),     # margin, no overlap
    ]
    keep = dd.CellPostProcessor(cells).post_process_cells()
    assert 2 in keep and 3 in keep
    # of the duplicate pair, exactly the larger one survives
    assert (0 in keep) != (1 in keep)
    assert 1 in keep


def test_polygon_intersection_area():
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    b = np.array([[5, 5], [15, 5], [15, 15], [5, 15]])
    inter = dd.intersection_area(a, b)
    area = dd.polygon_area(a)
    assert area == pytest.approx(121, rel=0.05)  # 11×11 rasterized
    assert inter == pytest.approx(36, rel=0.1)  # 6×6 rasterized overlap


def test_parallel_detection_and_resume(preprocessed_wsi, detection_run):
    """MP runner produces the same artifact set + flag-file resume."""
    import jax.numpy as jnp

    from cellvit_tpu.data.wsi import WSI
    from cellvit_tpu.inference.cell_detection_mp import (
        FLAG_FILE_NAME,
        CellSegmentationInferenceParallel,
    )
    from cellvit_tpu.utils.logger import Logger

    slide_path, patched, *_ = preprocessed_wsi
    wsi = WSI(
        name="slide1", patient="p1", slide_path=slide_path,
        patched_slide_path=patched,
    )
    inf = CellSegmentationInferenceParallel.__new__(
        CellSegmentationInferenceParallel
    )
    inf.logger = Logger(level="WARNING").create_logger()
    inf.batch_size = 4
    inf.max_instances = 512
    inf.mesh = None
    inf.mean = np.array([0.5, 0.5, 0.5], np.float32)
    inf.std = np.array([0.5, 0.5, 0.5], np.float32)
    inf.num_nuclei_classes = 6
    inf.run_conf = {"data": {"num_nuclei_classes": 6}}

    class FakeModel:
        patch_size = 16

    inf.model = FakeModel()
    from tests.test_wsi_pipeline import OracleInference

    def forward(variables, x):
        nb, hv, nt = OracleInference.forward(np.asarray(x))
        b, h, w, _ = nb.shape
        return {
            "nuclei_binary_map": jnp.asarray(nb),
            "hv_map": jnp.asarray(hv),
            "nuclei_type_map": jnp.asarray(nt),
            "tissue_types": jnp.zeros((b, 3)),
            "tokens": jnp.zeros((b, h // 16, w // 16, 8)),
        }

    inf.variables = {}
    inf._forward = forward

    results = inf.process_wsi_filelist(
        [wsi], n_workers=2, patch_size=256, overlap=64, geojson=True,
        subdir_name="mp", chunk_size=3,
    )
    assert len(results) == 1
    # streaming: heavy payloads are dispatched in bounded chunks, never
    # one whole-WSI record list
    assert 0 < inf.last_max_chunk_records <= 3
    outdir = Path(results[0][0])
    n_cells_mp = results[0][1]
    assert (outdir / "cells.json").exists()
    assert (outdir / "cells.zip").exists()
    assert (outdir / FLAG_FILE_NAME).exists()

    # same cell count as the single-WSI pipeline
    _, serial_outdir = detection_run
    serial = json.loads((serial_outdir / "cells.json").read_text())
    assert n_cells_mp == len(serial["cells"])

    # resume: flag file short-circuits
    results2 = inf.process_wsi_filelist(
        [wsi], n_workers=2, patch_size=256, overlap=64, subdir_name="mp"
    )
    assert results2 == []
