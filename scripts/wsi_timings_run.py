"""Recorded end-to-end WSI detection run with host stages on the clock
(VERDICT r4 task 6).

Builds a synthetic H&E-like pyramidal WSI large enough for >=64 tiles of
1024^2 (the bench geometry), preprocesses it through the production
extractor, then runs the production `CellSegmentationInference.process_wsi`
(reader -> one-jit device stage -> host contours -> dedup -> writers) with
the real CellViT-256 in bf16 — the exact pipeline the reference splits
across `cell_detection.py:244-483` + `cell_detection_mp.py:876-931`.

Two phases, same compiled functions:

  A. device-only: dispatch+fetch every batch, no host assembly — the pure
     device-stage wall (forward + on-device postproc + result transfer).
  B. full `process_wsi` — its `timings.json` now records `detection_loop`,
     the wall of the whole pipelined loop.

Device-stage utilization = A / B_detection_loop: how completely the
one-step software pipeline hides the host work behind the device stage.
Results are recorded in docs/PERFORMANCE.md ("End-to-end WSI run").

Run on the TPU box:  python scripts/wsi_timings_run.py --grid 8
"""

from __future__ import annotations

import argparse
import json

import sys
import time
from pathlib import Path

import numpy as np


REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def synth_slide(rng: np.random.Generator, size: int, n_cells: int) -> np.ndarray:
    """H&E-like slide: tissue-colored background, dark nuclei blobs.

    Painted via local windows (a full mgrid at 7744^2 would be slow)."""
    img = np.full((size, size, 3), (210, 160, 200), np.uint8)
    for _ in range(n_cells):
        r = int(rng.integers(4, 12))
        cy = int(rng.integers(r + 1, size - r - 1))
        cx = int(rng.integers(r + 1, size - r - 1))
        yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
        m = yy * yy + xx * xx <= r * r
        win = img[cy - r : cy + r + 1, cx - r : cx + r + 1]
        win[m] = rng.integers(26, 102, 3)
    return img


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=Path, default=Path("/tmp/wsi_timings"))
    ap.add_argument("--grid", type=int, default=8,
                    help="tiles per side (grid^2 tiles total)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import torch

    from cellvit_tpu.data.wsi import WSI, PatchedWSIInference
    from cellvit_tpu.inference.cell_detection import CellSegmentationInference
    from cellvit_tpu.models import CellViT256
    from cellvit_tpu.models.checkpoint_io import export_torch_state_dict
    from cellvit_tpu.preprocessing.patch_extraction import (
        PreProcessingConfig,
        PreProcessor,
    )
    from cellvit_tpu.preprocessing.wsi_reader import write_test_pyramid

    patch, ov = 1024, 64
    size = ov + args.grid * (patch - ov)  # 8 -> 7744
    args.out.mkdir(parents=True, exist_ok=True)
    slide_path = args.out / "slide_r5.tiff"
    if not slide_path.exists():
        rng = np.random.default_rng(5)
        # ~600 nuclei per 1024^2 region — the bench input density (the
        # postproc + host-contour cost depends on component structure)
        n_cells = 600 * args.grid * args.grid
        print(f"painting {size}^2 slide with {n_cells} nuclei…", flush=True)
        img = synth_slide(rng, size, n_cells)
        write_test_pyramid(str(slide_path), img, tile_size=256, n_levels=3,
                           mpp=0.25, magnification=40)
        del img

    pre_out = args.out / "preprocessed"
    if not (pre_out / "slide_r5" / "patch_metadata.json").exists():
        print("preprocessing…", flush=True)
        PreProcessor(PreProcessingConfig(
            wsi_paths=str(slide_path),
            output_path=str(pre_out),
            patch_size=patch,
            patch_overlap=100.0 * ov / patch,  # percent -> 64 px
            min_intersection_ratio=0.0,
            processes=4,
            wsi_extension="tiff",
        )).sample_patches_dataset()

    # random-init CellViT-256 exported to the reference .pth schema and
    # loaded back through the production checkpoint path (throughput and
    # stage timings are weight-independent; random-init outputs at 1024^2
    # produce ~3.8k instances per batch-8 — a realistic host load)
    ckpt_path = args.out / "cellvit256_randinit.pth"
    if not ckpt_path.exists():
        model = CellViT256(num_nuclei_classes=6, num_tissue_classes=19)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 256, 256, 3), np.float32),
            train=False,
        )
        sd = {
            k: torch.from_numpy(np.asarray(v))
            for k, v in export_torch_state_dict(
                variables, sam_encoder=False
            ).items()
        }
        torch.save(
            {
                "arch": "CellViT256",
                "model_state_dict": sd,
                "config": {
                    "data.num_nuclei_classes": 6,
                    "data.num_tissue_classes": 19,
                    "transformations.normalize.mean": [0.5, 0.5, 0.5],
                    "transformations.normalize.std": [0.5, 0.5, 0.5],
                },
            },
            ckpt_path,
        )

    inf = CellSegmentationInference(
        model_path=ckpt_path, batch_size=args.batch, mixed_precision=True
    )
    wsi = WSI(
        name="slide_r5", patient="p5", slide_path=slide_path,
        patched_slide_path=pre_out / "slide_r5",
    )
    n_patches = wsi.get_number_patches()
    print(f"{n_patches} patches", flush=True)
    assert n_patches >= 64, n_patches

    # ---- warmup / compile (excluded from both phases)
    ds = PatchedWSIInference(wsi)
    imgs0 = np.stack([ds[i][0] for i in range(args.batch)])
    t0 = time.perf_counter()
    inf._fetch_device(inf._dispatch_device(imgs0, 40))
    print(f"compile+first batch: {time.perf_counter() - t0:.1f}s", flush=True)
    tail = n_patches % args.batch
    if tail:
        # ragged last batch compiles its own graphs — keep that out of
        # the timed phases
        t0 = time.perf_counter()
        inf._fetch_device(inf._dispatch_device(imgs0[:tail], 40))
        print(f"tail-batch compile: {time.perf_counter() - t0:.1f}s",
              flush=True)

    # ---- phase A: device-only wall over the same batches (dispatch k+1
    # before fetching k — identical pipelining, host assembly skipped)
    loader_batches = []
    for i in range(0, n_patches, args.batch):
        idxs = list(range(i, min(i + args.batch, n_patches)))
        loader_batches.append(np.stack([ds[j][0] for j in idxs]))
    t0 = time.perf_counter()
    pending = None
    for imgs in loader_batches:
        handles = inf._dispatch_device(imgs, 40)
        if pending is not None:
            inf._fetch_device(pending)
        pending = handles
    inf._fetch_device(pending)
    device_wall = time.perf_counter() - t0
    print(f"phase A (device-only): {device_wall:.2f}s "
          f"= {device_wall / n_patches * 1e3:.1f} ms/patch", flush=True)

    # ---- phase B: the production pipeline (real PNG decode on the clock)
    outdir = inf.process_wsi(wsi, patch_size=patch, overlap=ov, geojson=True)
    timings = json.loads((outdir / "timings.json").read_text())
    loop = timings["stages_s"]["detection_loop"]

    # ---- phase C: same pipeline fed from pre-decoded RAM patches —
    # isolates the software pipeline's device/host overlap from this
    # box's single decode core (PNG decode is embarrassingly parallel
    # across loader workers; scaling it is a core-count question, see
    # docs/PERFORMANCE.md "End-to-end WSI run")
    import cellvit_tpu.inference.cell_detection as cd

    items = [ds[i] for i in range(n_patches)]

    class RamDS:
        def __init__(self, *_a, **_k):
            pass

        def __len__(self):
            return n_patches

        def __getitem__(self, i):
            return items[i]

        collate_batch = staticmethod(PatchedWSIInference.collate_batch)

    orig = cd.PatchedWSIInference
    cd.PatchedWSIInference = RamDS
    try:
        outdir_c = inf.process_wsi(
            wsi, subdir_name="ram_fed", patch_size=patch, overlap=ov
        )
    finally:
        cd.PatchedWSIInference = orig
    timings_c = json.loads((outdir_c / "timings.json").read_text())
    loop_c = timings_c["stages_s"]["detection_loop"]

    summary = {
        "n_patches": timings["n_patches"],
        "device_only_wall_s": round(device_wall, 2),
        "detection_loop_wall_s": loop,
        "device_stage_utilization": round(device_wall / loop, 4),
        "stages_s": timings["stages_s"],
        "pps_end_to_end": round(timings["n_patches"] / loop, 2),
        "ram_fed": {
            "detection_loop_wall_s": loop_c,
            "device_stage_utilization": round(device_wall / loop_c, 4),
            "stages_s": timings_c["stages_s"],
            "pps_end_to_end": round(
                timings_c["n_patches"] / loop_c, 2
            ),
        },
    }
    print(json.dumps(summary, indent=2))
    (args.out / "wsi_timings_summary.json").write_text(
        json.dumps(summary, indent=2)
    )


if __name__ == "__main__":
    main()
