"""MoNuSeg evaluation pipeline test (oracle forward, patched mode)."""

import json

import numpy as np
import pytest


def test_monuseg_eval_patched(tmp_path, rng):
    import jax.numpy as jnp

    from cellvit_tpu.inference.eval_monuseg import InferenceCellViTMoNuSeg
    from cellvit_tpu.utils.logger import Logger
    from tests.test_wsi_pipeline import OracleInference
    from PIL import Image

    # MoNuSeg-format dir: one 384² image with dark nuclei
    h = w = 384
    img = np.full((h, w, 3), 210, np.uint8)
    inst = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(1, 13):
        cy, cx = rng.integers(20, h - 20, 2)
        sel = (yy - cy) ** 2 + (xx - cx) ** 2 <= 64
        img[sel] = (70, 40, 110)
        inst[sel] = i
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    Image.fromarray(img).save(tmp_path / "images" / "im1.png")
    np.save(
        tmp_path / "labels" / "im1.npy",
        np.array({"inst_map": inst, "type_map": (inst > 0).astype(np.int32)},
                 dtype=object),
        allow_pickle=True,
    )

    inf = InferenceCellViTMoNuSeg.__new__(InferenceCellViTMoNuSeg)
    inf.run_dir = tmp_path
    inf.dataset_path = tmp_path
    inf.magnification = 40
    inf.patching = True
    inf.overlap = 64
    inf.patch_size = 256
    inf.batch_size = 8
    inf.num_classes = 6
    inf.run_conf = {"transformations": {"normalize": {}}}
    inf.logger = Logger(level="WARNING").create_logger()

    def forward(variables, x):
        nb, hv, nt = OracleInference.forward(np.asarray(x))
        b, hh, ww, _ = nb.shape
        return {
            "nuclei_binary_map": jnp.asarray(nb),
            "hv_map": jnp.asarray(hv),
            "nuclei_type_map": jnp.asarray(nt),
            "tissue_types": jnp.zeros((b, 3)),
        }

    inf.variables = {}
    inf._forward = forward
    results = inf.run_inference()
    d = results["dataset"]
    # oracle maps → near-perfect recovery
    assert d["bPQ"] > 0.6
    assert d["f1_detection"] > 0.8
    assert (tmp_path / "inference_monuseg_results.json").exists()


def test_monuseg_patched_end_aligned_overlap_no_double_count(tmp_path):
    """(n-p) % stride != 0 grid: 320² image, patches at [0, 64] → the
    end-aligned tile overlaps its neighbor by 192 px (> 2·64 margin).
    Cells planted in the band that is >64 px interior in BOTH tiles were
    double-counted before the per-side-margin fix (VERDICT r2 item 5);
    each GT cell must be detected exactly once."""
    import jax.numpy as jnp

    from cellvit_tpu.inference.eval_monuseg import InferenceCellViTMoNuSeg
    from cellvit_tpu.utils.logger import Logger
    from tests.test_wsi_pipeline import OracleInference
    from PIL import Image

    h = w = 320
    img = np.full((h, w, 3), 210, np.uint8)
    inst = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    # (128, 192) is the double-mid band along each axis for p=256, ov=64
    centers = [(160, 160), (140, 170), (180, 135), (160, 40), (40, 160), (285, 285)]
    for i, (cy, cx) in enumerate(centers, start=1):
        sel = (yy - cy) ** 2 + (xx - cx) ** 2 <= 64
        img[sel] = (70, 40, 110)
        inst[sel] = i
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    Image.fromarray(img).save(tmp_path / "images" / "im1.png")
    np.save(
        tmp_path / "labels" / "im1.npy",
        np.array({"inst_map": inst, "type_map": (inst > 0).astype(np.int32)},
                 dtype=object),
        allow_pickle=True,
    )

    inf = InferenceCellViTMoNuSeg.__new__(InferenceCellViTMoNuSeg)
    inf.run_dir = tmp_path
    inf.dataset_path = tmp_path
    inf.magnification = 40
    inf.patching = True
    inf.overlap = 64
    inf.patch_size = 256
    inf.batch_size = 8
    inf.num_classes = 6
    inf.run_conf = {"transformations": {"normalize": {}}}
    inf.logger = Logger(level="WARNING").create_logger()

    def forward(variables, x):
        nb, hv, nt = OracleInference.forward(np.asarray(x))
        b = nb.shape[0]
        return {
            "nuclei_binary_map": jnp.asarray(nb),
            "hv_map": jnp.asarray(hv),
            "nuclei_type_map": jnp.asarray(nt),
            "tissue_types": jnp.zeros((b, 3)),
        }

    inf.variables = {}
    inf._forward = forward
    results = inf.run_inference()
    d = results["dataset"]
    # every planted cell found exactly once: perfect precision AND recall
    assert d["precision_detection"] == 1.0, d
    assert d["recall_detection"] == 1.0, d
    assert d["f1_detection"] == 1.0, d
