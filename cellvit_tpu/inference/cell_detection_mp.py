"""Pipelined multi-WSI cell detection with bounded host memory.

Reference parity: `inference/cell_detection_mp.py` (community-contributed
pipelined runner, :130-931): a filelist-level dataset spanning many WSIs
feeds the accelerator loop continuously; host postprocessing (contours,
cell assembly, dedup, writers, zip) runs in a worker pool with
backpressure, and per-WSI flag files make runs resumable (`--overwrite`
to redo).

Division of labor differs from the reference by design: watershed +
instance statistics already ran on device in the accelerator loop, so the
workers only do contour/dict assembly, dedup and serialization.

Memory model (the reference pickles one whole-WSI payload per worker,
cell_detection_mp.py:876-931 — ~6 MB/patch of token maps, unbounded):
here the heavy per-patch records (instance map + ViT token map) are
dispatched in fixed-size CHUNKS as the device loop produces them; chunk
workers reduce them to compact per-cell dicts (token crop-means included),
and a per-WSI finalize step dedups + writes files. Peak host memory is
O(max_outstanding · chunk_size · record) + O(cells), never O(WSI · record).

Workers run in a 'spawn' multiprocessing context: fork is unsafe once JAX
has started its device threads (deadlock warning observed under fork).
"""

from __future__ import annotations

import json
import multiprocessing
import time
import zipfile
from concurrent.futures import Future, ProcessPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from cellvit_tpu.data.wsi import WSI, PatchedWSIInference
from cellvit_tpu.inference.cell_detection import (
    CellSegmentationInference,
    assemble_patch_cells,
    assemble_patch_instances,
)
from cellvit_tpu.inference import dedup as dd
from cellvit_tpu.inference.geojson_export import TYPE_NUCLEI_DICT, convert_geojson

FLAG_FILE_NAME = ".cell_detection_done"


def postprocess_chunk_worker(payload: Dict) -> Dict:
    """Worker stage 1: a CHUNK of per-patch device outputs → compact cells.

    Everything in `payload` is plain numpy / python data. Returns per-cell
    dicts plus graph features (per-cell token means) — the heavy (Ht, Wt, E)
    token maps never leave this process. Mirrors the per-cell assembly of
    the reference worker (cell_detection_mp.py:218-340) on a bounded slice.
    """
    records = payload["records"]  # list of (inst_map, stats, tokens, meta)
    patch_size = payload["patch_size"]
    overlap = payload["overlap"]
    scaling = payload["scaling"]
    token_patch = payload["token_patch_size"]

    cells: List[Dict] = []
    detections: List[Dict] = []
    graph_tokens: List[np.ndarray] = []
    graph_positions: List[np.ndarray] = []
    graph_contours: List[np.ndarray] = []
    processed_patches: List[str] = []

    for inst_map, stats, tokens, meta in records:
        instances = assemble_patch_instances(inst_map, stats)
        row, col = meta["row"], meta["col"]
        processed_patches.append(f"{row}_{col}")
        patch_cells, dets, g_tok, g_pos, g_con = assemble_patch_cells(
            instances, tokens, row, col,
            patch_size, overlap, scaling, token_patch,
        )
        cells.extend(patch_cells)
        detections.extend(dets)
        graph_tokens.extend(g_tok)
        graph_positions.extend(g_pos)
        graph_contours.extend(g_con)

    return {
        "cells": cells,
        "detections": detections,
        "graph_tokens": graph_tokens,
        "graph_positions": graph_positions,
        "graph_contours": graph_contours,
        "processed_patches": processed_patches,
    }


def finalize_wsi_worker(payload: Dict) -> Tuple[str, int]:
    """Worker stage 2: merged compact chunks → dedup → output files.

    Writes cells.json / cell_detection.json / optional geojson, a zip of
    all of them, cells.pt graph, and the resume flag file (reference
    cell_detection_mp.py:368-412).
    """
    wsi_meta = payload["wsi_metadata"]
    outdir = Path(payload["outdir"])
    geojson = payload["geojson"]

    cells: List[Dict] = []
    detections: List[Dict] = []
    graph_tokens: List[np.ndarray] = []
    graph_positions: List[np.ndarray] = []
    graph_contours: List[np.ndarray] = []
    processed_patches: List[str] = []
    for chunk in payload["chunks"]:
        cells.extend(chunk["cells"])
        detections.extend(chunk["detections"])
        graph_tokens.extend(chunk["graph_tokens"])
        graph_positions.extend(chunk["graph_positions"])
        graph_contours.extend(chunk["graph_contours"])
        processed_patches.extend(chunk["processed_patches"])

    keep = dd.CellPostProcessor(cells).post_process_cells()
    cells = [cells[i] for i in keep]
    detections = [detections[i] for i in keep]
    graph_tokens = [graph_tokens[i] for i in keep]
    graph_positions = [graph_positions[i] for i in keep]
    graph_contours = [graph_contours[i] for i in keep]

    outdir.mkdir(parents=True, exist_ok=True)
    nuclei_types = {"Background": 0, **{v: k for k, v in TYPE_NUCLEI_DICT.items()}}
    payload_out = {
        "wsi_metadata": wsi_meta,
        "processed_patches": processed_patches,
        "type_map": nuclei_types,
        "cells": cells,
    }
    files = {"cells.json": payload_out}
    files["cell_detection.json"] = {**payload_out, "cells": detections}
    if geojson:
        files["cells.geojson"] = convert_geojson(cells, True)
        files["cell_detection.geojson"] = convert_geojson(cells, False)

    # zip outputs incrementally (reference zips results, :368-404)
    with zipfile.ZipFile(outdir / "cells.zip", "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in files.items():
            zf.writestr(name, json.dumps(data, indent=2))
    for name, data in files.items():
        (outdir / name).write_text(json.dumps(data, indent=2))

    try:
        import torch

        from cellvit_tpu.inference.cell_detection import CellGraphDataWSI

        graph = CellGraphDataWSI(
            x=torch.from_numpy(np.stack(graph_tokens))
            if graph_tokens else torch.zeros((0, 1)),
            positions=torch.from_numpy(np.stack(graph_positions))
            if graph_positions else torch.zeros((0, 2)),
            contours=[torch.from_numpy(np.asarray(c)) for c in graph_contours],
            metadata={"wsi_metadata": wsi_meta, "nuclei_types": nuclei_types},
        )
        torch.save(graph, outdir / "cells.pt")
    except ImportError:
        pass

    (outdir / FLAG_FILE_NAME).write_text("done")
    return str(outdir), len(cells)


class CellSegmentationInferenceParallel(CellSegmentationInference):
    """Multi-WSI runner: device loop + chunked postprocessing worker pool."""

    # observability hook for tests: max record-count of any dispatched chunk
    last_max_chunk_records: int = 0

    def process_wsi_filelist(
        self,
        wsis: List[WSI],
        n_workers: int = 4,
        max_outstanding: int = 4,
        chunk_size: int = 32,
        patch_size: int = 1024,
        overlap: int = 64,
        geojson: bool = False,
        overwrite: bool = False,
        subdir_name: Optional[str] = None,
        magnification: Optional[float] = None,
    ) -> List[Tuple[str, int]]:
        results: List[Tuple[str, int]] = []
        finalize_futures: List[Future] = []
        all_chunk_futures: List[Future] = []  # cross-WSI backpressure
        self.last_max_chunk_records = 0

        def drain(block: bool) -> None:
            # backpressure loop (reference :915-921)
            while finalize_futures and (
                block or len(finalize_futures) >= max_outstanding
            ):
                fut = finalize_futures[0]
                if not block and not fut.done():
                    time.sleep(0.05)
                    continue
                results.append(fut.result())
                finalize_futures.pop(0)

        from concurrent.futures import ThreadPoolExecutor

        ctx = multiprocessing.get_context("spawn")
        with ProcessPoolExecutor(
            max_workers=n_workers, mp_context=ctx
        ) as pool, ThreadPoolExecutor(
            max_workers=max_outstanding, thread_name_prefix="wsi-handoff"
        ) as handoff_pool:
            for wsi in wsis:
                outdir = wsi.patched_slide_path / "cell_detection"
                if subdir_name:
                    outdir = outdir / subdir_name
                if not overwrite and (outdir / FLAG_FILE_NAME).exists():
                    self.logger.info(f"skipping {wsi.name} (flag file present)")
                    continue
                mag = magnification or wsi.metadata.get("magnification") or 40
                dataset = PatchedWSIInference(wsi)
                from cellvit_tpu.data.loader import DataLoader, SequentialSampler

                loader = DataLoader(
                    dataset, batch_size=self.batch_size,
                    sampler=SequentialSampler(len(dataset)), num_workers=8,
                    collate_fn=PatchedWSIInference.collate_batch,
                )
                chunk_futures: List[Future] = []
                records: List = []
                n_patches = 0

                def submit_chunk() -> None:
                    nonlocal records
                    if not records:
                        return
                    self.last_max_chunk_records = max(
                        self.last_max_chunk_records, len(records)
                    )
                    # bound outstanding heavy payloads (token maps) ACROSS
                    # WSIs — previous slides' tail chunks may still be in
                    # flight, so counting only this WSI's futures would let
                    # peak host memory grow to max_outstanding × the bound
                    all_chunk_futures[:] = [
                        f for f in all_chunk_futures if not f.done()
                    ]
                    while (
                        sum(not f.done() for f in all_chunk_futures)
                        >= max_outstanding
                    ):
                        time.sleep(0.05)
                    fut = pool.submit(
                        postprocess_chunk_worker,
                        {
                            "records": records,
                            "patch_size": patch_size,
                            "overlap": overlap,
                            "scaling": wsi.metadata["downsampling"],
                            "token_patch_size": self.model.patch_size,
                        },
                    )
                    chunk_futures.append(fut)
                    all_chunk_futures.append(fut)
                    records = []

                for imgs, metadata in loader:
                    inst_np, stats, tokens = self._device_outputs(imgs, mag)
                    for i, meta in enumerate(metadata):
                        per = {k: v[i] for k, v in stats.items()}
                        records.append(
                            (inst_np[i].astype(np.int32), per, tokens[i], meta)
                        )
                        n_patches += 1
                        if len(records) >= chunk_size:
                            submit_chunk()
                submit_chunk()

                # hand the chunk gather + finalize to a waiter thread so the
                # device loop starts the next WSI immediately instead of
                # blocking on this WSI's tail contour tracing (the gather is
                # compact: token maps were reduced in the workers)
                def gather_and_finalize(
                    chunk_futures=chunk_futures,
                    wsi_metadata=wsi.metadata,
                    outdir=outdir,
                ):
                    chunks = [f.result() for f in chunk_futures]
                    return pool.submit(
                        finalize_wsi_worker,
                        {
                            "chunks": chunks,
                            "wsi_metadata": wsi_metadata,
                            "outdir": str(outdir),
                            "geojson": geojson,
                        },
                    ).result()

                finalize_futures.append(
                    handoff_pool.submit(gather_and_finalize)
                )
                self.logger.info(
                    f"{wsi.name}: {n_patches} patches in "
                    f"{len(chunk_futures)} chunks "
                    "queued for postprocessing"
                )
                drain(block=False)
            drain(block=True)
        return results
