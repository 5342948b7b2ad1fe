"""WSI cell detection: tile stream → device forward+postproc → dedup →
cells.json / GeoJSON / cell graph.

Equivalent of the reference `cell_segmentation/inference/cell_detection.py`
(CellSegmentationInference:92-598 + writers): processes a preprocessed WSI
(1024² patches, 64 px overlap) through the model, runs the HV→instance
watershed and the per-instance statistics on device, extracts contours on
host, converts to global slide coordinates with the reference's formula
(:343-350), attaches margin codes 0-8 / edge-neighbor lists, deduplicates
across tiles, and writes `cells.json`, `cell_detection.json`, optional
QuPath `.geojson` files and the `cells.pt` token graph.

Key TPU-side difference from the reference: postprocessing is part of the
jitted device computation (the reference syncs every batch to CPU for
cv2/scipy watershed — its documented bottleneck, README:56).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from cellvit_tpu.data.loader import DataLoader, SequentialSampler
from cellvit_tpu.data.wsi import WSI, PatchedWSIInference
from cellvit_tpu.inference import dedup as dd
from cellvit_tpu.inference.geojson_export import convert_geojson
from cellvit_tpu.ops.hv_postproc import (
    instance_map_batch,
    instance_map_batch_maps,
)
from cellvit_tpu.ops.instance_stats import (
    contours_from_instance_map,
    instance_stats_batch,
    relabel_consecutive,
)
from cellvit_tpu.utils.logger import Logger


def assemble_patch_instances(
    inst_map: np.ndarray, stats: Dict[str, np.ndarray]
) -> Dict[int, Dict]:
    """Host stage: contours + per-instance dicts for one patch.

    Module-level (not a method) so multiprocessing workers can run it on
    pickled device outputs (cell_detection_mp pipelining).
    """
    contours = contours_from_instance_map(inst_map)
    info: Dict[int, Dict] = {}
    for inst_id, contour in contours.items():
        k = inst_id - 1
        if k >= stats["valid"].shape[0] or not stats["valid"][k]:
            continue
        r0, r1, c0, c1 = stats["bbox"][k]
        info[inst_id] = {
            "bbox": np.array([[r0, c0], [r1, c1]]),
            "centroid": stats["centroid"][k],
            "contour": contour,
            "type_prob": float(stats["type_prob"][k]),
            "type": int(stats["type"][k]),
        }
    return info


def assemble_patch_cells(
    instances: Dict[int, Dict],
    tokens: np.ndarray,
    row: int,
    col: int,
    patch_size: int,
    overlap: int,
    scaling: float,
    token_patch: int,
) -> Tuple[List[Dict], List[Dict], List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
    """Per-patch host assembly: instances → global-coordinate cell dicts.

    Shared by the synchronous driver (`process_wsi`) and the chunked
    multiprocessing worker (`cell_detection_mp.postprocess_chunk_worker`)
    so the global-offset formula (reference cell_detection.py:343-350),
    margin codes and token-crop means cannot diverge between the paths.

    Returns (cells, detections, graph_tokens, graph_positions,
    graph_contours) for one patch; `tokens` is that patch's (Ht, Wt, E)
    token map.
    """
    cells: List[Dict] = []
    detections: List[Dict] = []
    g_tokens: List[np.ndarray] = []
    g_positions: List[np.ndarray] = []
    g_contours: List[np.ndarray] = []
    x_global = int(row * patch_size * scaling - (row + 0.5) * overlap)
    y_global = int(col * patch_size * scaling - (col + 0.5) * overlap)
    offset_global = np.array([x_global, y_global])
    for cell in instances.values():
        if cell["type"] == 0:
            continue
        centroid_global = cell["centroid"] + np.flip(offset_global)
        contour_global = cell["contour"] + np.flip(offset_global)
        bbox_global = cell["bbox"] + offset_global
        cell_dict = {
            "bbox": bbox_global.tolist(),
            "centroid": centroid_global.tolist(),
            "contour": contour_global.tolist(),
            "type_prob": cell["type_prob"],
            "type": cell["type"],
            "patch_coordinates": [row, col],
            "cell_status": dd.get_cell_position_margin(
                cell["bbox"], patch_size, overlap
            ),
            "offset_global": offset_global.tolist(),
        }
        if np.max(cell["bbox"]) == patch_size or np.min(cell["bbox"]) == 0:
            position = dd.get_cell_position(cell["bbox"], patch_size)
            cell_dict["edge_position"] = True
            cell_dict["edge_information"] = {
                "position": position,
                "edge_patches": dd.get_edge_patch(position, row, col),
            }
        else:
            cell_dict["edge_position"] = False
        cells.append(cell_dict)
        detections.append(
            {
                "bbox": bbox_global.tolist(),
                "centroid": centroid_global.tolist(),
                "type": cell["type"],
            }
        )
        # ViT-token crop mean over the cell bbox (reference :397-413)
        bb = cell["bbox"].astype(np.float64) / token_patch
        r0, c0 = np.floor(bb[0]).astype(int)
        r1, c1 = np.ceil(bb[1]).astype(int)
        crop = tokens[r0 : max(r1, r0 + 1), c0 : max(c1, c0 + 1)]
        g_tokens.append(crop.reshape(-1, crop.shape[-1]).mean(0))
        g_positions.append(centroid_global)
        g_contours.append(contour_global)
    return cells, detections, g_tokens, g_positions, g_contours


@dataclass
class CellGraphDataWSI:
    """Cell-token graph (reference datamodel/cell_graph_datamodel.py:18-26)."""

    x: object  # (N, E) tokens
    positions: object  # (N, 2)
    contours: List
    metadata: Dict = field(default_factory=dict)


class CellSegmentationInference:
    """WSI inference driver.

    Args:
        model_path: reference-format torch `.pth` checkpoint, OR
        run_dir: a cellvit_tpu training run directory (native checkpoint).
    """

    def __init__(
        self,
        model_path: Optional[Union[str, Path]] = None,
        run_dir: Optional[Union[str, Path]] = None,
        checkpoint_name: str = "latest_checkpoint",
        batch_size: int = 8,
        mixed_precision: bool = False,
        max_instances_per_tile: int = 2048,
        mesh=None,
        logger=None,
    ) -> None:
        """`mesh`: optional jax.sharding.Mesh — tile batches are sharded
        over its `data` axis (SURVEY §2.10 patch-batch sharding for WSI
        inference); ragged tails are padded to the data-axis multiple and
        the padding dropped on host."""
        self.batch_size = batch_size
        self.max_instances = max_instances_per_tile
        self.mesh = mesh
        self.logger = logger or Logger(level="INFO").create_logger()

        if model_path is not None:
            from cellvit_tpu.models.checkpoint_io import load_checkpoint

            self.model, self.variables, self.run_conf = load_checkpoint(
                str(model_path)
            )
        elif run_dir is not None:
            from cellvit_tpu.inference.eval_pannuke import InferenceCellViT

            helper = InferenceCellViT(run_dir, checkpoint_name=checkpoint_name)
            self.model, self.variables = helper.model, helper.variables
            self.run_conf = helper.run_conf
        else:
            raise ValueError("provide model_path or run_dir")

        if mixed_precision and getattr(self.model, "dtype", None) != jnp.bfloat16:
            # AMP equivalent (reference __setup_amp, cell_detection.py:97-115):
            # compute in bf16, parameters stay fp32 (flax casts at apply)
            self.model = self.model.clone(dtype=jnp.bfloat16)

        norm = (self.run_conf.get("transformations") or {}).get("normalize", {})
        self.mean = np.asarray(norm.get("mean", (0.5, 0.5, 0.5)), np.float32)
        self.std = np.asarray(norm.get("std", (0.5, 0.5, 0.5)), np.float32)
        self.num_nuclei_classes = self.run_conf["data"]["num_nuclei_classes"]
        if self.mesh is not None:
            from cellvit_tpu.parallel.mesh import replicate

            self.variables = jax.device_put(
                self.variables, replicate(self.mesh)
            )
        from cellvit_tpu.models.cellvit import CellViT as _CellViT
        from cellvit_tpu.models.fused import fused_forward_maps

        if type(self.model) is _CellViT:
            # separate-tower HV model: concat-free fused decoder towers with
            # W-minor header maps (models/fused.py — narrow channel-minor
            # maps pay a 64× HBM lane-padding tax on TPU)
            self._forward_maps = jax.jit(
                lambda v, x: fused_forward_maps(
                    self.model, v, x, retrieve_tokens=True
                )
            )
        self._forward = jax.jit(
            lambda v, x: self.model.apply(
                v, x, train=False, retrieve_tokens=True
            )
        )

    def _get_device_post(self):
        """Device postprocessing after the model forward (probability maps
        → watershed → relabel → per-instance stats) as TWO chained jits:
        no eager op ever sits between them (the round-3 formulation ran
        softmax/argmax/astype eagerly between jits, each paying a dispatch
        round-trip of ~30-90 ms over a remote-TPU tunnel), and chaining
        device-resident arrays through a second jit costs no sync. It is
        two jits rather than one because the fused single-program version
        exceeds the 128 MB VMEM program budget at 8×1024² (131.21M —
        XLA co-schedules the relabel/stats segment against the Pallas
        label-compaction kernel's 35M scoped window+spill demand; first
        hit by the round-5 recorded WSI run, results/wsi_run.log). Built
        lazily so tests can stub `_forward` (standard channel-minor
        outputs) after construction; `_forward_maps` (set for
        separate-tower HV models) emits postproc-ready W-minor maps."""
        post = getattr(self, "_device_post_fn", None)
        if post is not None:
            return post
        use_maps = hasattr(self, "_forward_maps")

        def _device_instances(out, ksize, object_size):
            if use_maps:
                np1 = out["np_prob"]
                inst = instance_map_batch_maps(
                    np1, out["hv0"], out["hv1"],
                    object_size=object_size, ksize=ksize,
                )
                # softmax is monotone per pixel: argmax over raw logits
                type_map = jnp.argmax(
                    out["type_map_cmajor"], 1
                ).astype(jnp.int32)
            else:
                np1 = jax.nn.softmax(
                    out["nuclei_binary_map"].astype(jnp.float32), -1
                )[..., 1]
                inst = instance_map_batch(
                    np1, out["hv_map"].astype(jnp.float32),
                    object_size=object_size, ksize=ksize,
                )
                type_map = jnp.argmax(
                    out["nuclei_type_map"], -1
                ).astype(jnp.int32)
            return inst, type_map, np1

        def _device_stats(inst, type_map, np1):
            h, w = inst.shape[1], inst.shape[2]
            inst = jax.vmap(
                lambda m: relabel_consecutive(m, h * w // 2 + 2)
            )(inst)
            stats = instance_stats_batch(
                inst, type_map, np1,
                max_instances=self.max_instances,
                num_classes=self.num_nuclei_classes,
            )
            return inst, stats

        # Cap the scoped-VMEM budget on TPU: at 8×1024² the latency-hiding
        # scheduler otherwise co-schedules ~96M of buffers next to the
        # Pallas label-compaction kernel's 35M scoped demand and overruns
        # the 128M VMEM program budget by 3.2M (first hit by the recorded
        # round-5 WSI run; env-level XLA_FLAGS can't carry this TPU-only
        # flag through a CPU-frontend process, per-jit options can).
        opts = (
            {"xla_tpu_scoped_vmem_limit_kib": 96 * 1024}
            if jax.default_backend() not in ("cpu",)
            else None
        )
        inst_jit = jax.jit(
            _device_instances,
            static_argnames=("ksize", "object_size"),
            compiler_options=opts,
        )
        stats_jit = jax.jit(_device_stats, compiler_options=opts)

        def post(out, ksize, object_size):
            inst, type_map, np1 = inst_jit(
                out, ksize=ksize, object_size=object_size
            )
            return stats_jit(inst, type_map, np1)

        self._device_post_fn = post
        return post

    # ----------------------------------------------------------- checks

    def check_wsi(
        self,
        wsi: WSI,
        magnification: float = 40.0,
        patch_size: int = 1024,
        overlap: int = 64,
    ) -> None:
        """Sanity checks (reference cell_detection.py:1009-1039; the 256²
        pipeline uses the same checks at patch 256/overlap 64,
        cell_detection_256.py)."""
        if wsi.metadata["magnification"] is not None:
            patch_mag = float(wsi.metadata["magnification"])
        else:
            patch_mag = float(wsi.metadata["base_magnification"]) / float(
                wsi.metadata["downsampling"]
            )
        if patch_mag != float(magnification):
            raise RuntimeError(
                f"magnification mismatch: patches at {patch_mag}, "
                f"requested {magnification}"
            )
        if int(wsi.metadata["patch_size"]) != patch_size:
            raise RuntimeError(f"patch size must be {patch_size}")
        if int(wsi.metadata["patch_overlap"]) != overlap:
            raise RuntimeError(f"patch overlap must be {overlap}")

    # ----------------------------------------------------------- core

    def _dispatch_device(
        self, imgs: np.ndarray, magnification: float
    ) -> Tuple:
        """Queue the device stage (forward + watershed + per-instance
        stats) WITHOUT fetching: JAX dispatch is asynchronous, so the host
        can assemble the previous batch's cells while the device works —
        the one-step software pipeline the reference's mp variant builds
        per-WSI with processes (`cell_detection_mp.py:876-931`); here the
        device/host overlap is per-batch inside one WSI."""
        x = (imgs - self.mean) / self.std
        n_batch = x.shape[0]
        if self.mesh is not None:
            from cellvit_tpu.parallel.mesh import pad_batch_to, shard_batch

            n_data = self.mesh.shape["data"]
            padded = -(-n_batch // n_data) * n_data
            x = shard_batch(pad_batch_to(np.asarray(x), padded), self.mesh)
        else:
            x = jnp.asarray(x)
        ksize, object_size = (21, 10) if magnification == 40 else (11, 3)
        fwd = getattr(self, "_forward_maps", None) or self._forward
        out = fwd(self.variables, x)
        tokens = out["tokens"]
        inst, stats = self._get_device_post()(
            out, ksize=ksize, object_size=object_size
        )
        return inst, stats, tokens, n_batch

    def _fetch_device(
        self, handles: Tuple
    ) -> Tuple[np.ndarray, Dict[str, np.ndarray], np.ndarray]:
        """Block on a `_dispatch_device` result and copy it to host."""
        inst, stats, tokens, n_batch = handles
        inst_np = np.asarray(inst)[:n_batch]
        stats = jax.tree_util.tree_map(
            lambda a: np.asarray(a)[:n_batch], stats
        )
        tokens = np.asarray(tokens, np.float32)[:n_batch]
        return inst_np, stats, tokens

    def _device_outputs(
        self, imgs: np.ndarray, magnification: float
    ) -> Tuple[np.ndarray, Dict[str, np.ndarray], np.ndarray]:
        """Device stage: forward + watershed + per-instance stats.

        Returns host copies of (instance maps (B, H, W), stats dict,
        token maps (B, Ht, Wt, E)) — everything the host stage needs."""
        return self._fetch_device(self._dispatch_device(imgs, magnification))

    def _predict_batch(
        self, imgs: np.ndarray, magnification: float
    ) -> Tuple[List[Dict[int, Dict]], np.ndarray]:
        """Forward + on-device postproc for a (B, H, W, 3) [0,1] batch.

        Returns per-patch instance dicts (bbox/centroid/contour/type/
        type_prob — reference `get_cell_predictions_with_tokens`,
        cell_detection.py:485-514) and the (B, Ht, Wt, E) token maps.
        """
        inst_np, stats, tokens = self._device_outputs(imgs, magnification)
        batch_instances = [
            assemble_patch_instances(
                inst_np[i],
                jax.tree_util.tree_map(lambda a: a[i], stats),
            )
            for i in range(inst_np.shape[0])
        ]
        return batch_instances, tokens

    def process_wsi(
        self,
        wsi: WSI,
        subdir_name: Optional[str] = None,
        patch_size: int = 1024,
        overlap: int = 64,
        geojson: bool = False,
        magnification: Optional[float] = None,
        profile_dir: Optional[Path] = None,
    ) -> Path:
        """Process one preprocessed WSI; returns the output directory.

        Per-stage wall timings (patch load / device forward+postproc /
        host assembly / dedup / serialization) are logged and written to
        `timings.json` in the output dir — the observability the reference
        only sketches (`utils/tools.py:22-40` timers, commented torch
        profiler hooks in `cell_detection_mp.py:813,831`). `profile_dir`
        additionally captures a `jax.profiler` device trace of the run.
        """
        from cellvit_tpu.utils.tools import Timer, device_trace

        timer = Timer()
        self.logger.info(f"processing WSI {wsi.name}")
        if magnification is None:
            magnification = wsi.metadata.get("magnification") or 40
        dataset = PatchedWSIInference(wsi)
        loader = DataLoader(
            dataset,
            batch_size=self.batch_size,
            sampler=SequentialSampler(len(dataset)),
            num_workers=8,
            collate_fn=PatchedWSIInference.collate_batch,
        )
        nuclei_types = {"Background": 0}
        from cellvit_tpu.inference.geojson_export import TYPE_NUCLEI_DICT

        type_names = TYPE_NUCLEI_DICT
        nuclei_types.update({v: k for k, v in TYPE_NUCLEI_DICT.items()})

        cell_dict_wsi: List[Dict] = []
        cell_dict_detection: List[Dict] = []
        graph_tokens: List[np.ndarray] = []
        graph_positions: List[np.ndarray] = []
        graph_contours: List[np.ndarray] = []
        processed_patches: List[str] = []

        scaling = wsi.metadata["downsampling"]
        token_patch = self.model.patch_size

        def assemble(fetched, metadata):
            inst_np, stats, tokens = fetched
            for idx, patch_meta in enumerate(metadata):
                instances = assemble_patch_instances(
                    inst_np[idx],
                    jax.tree_util.tree_map(lambda a: a[idx], stats),
                )
                row, col = patch_meta["row"], patch_meta["col"]
                processed_patches.append(f"{row}_{col}")
                cells, dets, g_tok, g_pos, g_con = assemble_patch_cells(
                    instances, tokens[idx], row, col,
                    patch_size, overlap, scaling, token_patch,
                )
                cell_dict_wsi.extend(cells)
                cell_dict_detection.extend(dets)
                graph_tokens.extend(g_tok)
                graph_positions.extend(g_pos)
                graph_contours.extend(g_con)

        # One-step software pipeline: batch k+1 is DISPATCHED (async)
        # before batch k is fetched/assembled, so host contour extraction
        # overlaps the device's forward+postproc. `device_forward_postproc`
        # times dispatch + the blocking fetch (the residual device time the
        # host could not hide); `host_assembly` is pure host work.
        # `detection_loop` is the wall clock of the whole pipelined loop —
        # device-stage utilization = (pure device+transfer wall for the same
        # batches) / detection_loop (recorded runs: docs/PERFORMANCE.md
        # "End-to-end WSI run").
        timer.start("detection_loop")
        with device_trace(str(profile_dir) if profile_dir else None):
            batches = iter(loader)
            pending = None
            while True:
                with timer.lap("patch_load"):
                    item = next(batches, None)
                if item is not None:
                    imgs, metadata = item
                    with timer.lap("device_forward_postproc"):
                        handles = self._dispatch_device(imgs, magnification)
                if pending is not None:
                    prev_handles, prev_meta = pending
                    with timer.lap("device_forward_postproc"):
                        fetched = self._fetch_device(prev_handles)
                    with timer.lap("host_assembly"):
                        assemble(fetched, prev_meta)
                    pending = None
                if item is None:
                    break
                pending = (handles, metadata)
        timer.stop("detection_loop")

        self.logger.info(f"detected cells before cleaning: {len(cell_dict_wsi)}")
        timer.start("dedup")
        keep_idx = dd.CellPostProcessor(cell_dict_wsi, self.logger).post_process_cells()
        cell_dict_wsi = [cell_dict_wsi[i] for i in keep_idx]
        cell_dict_detection = [cell_dict_detection[i] for i in keep_idx]
        graph_tokens = [graph_tokens[i] for i in keep_idx]
        graph_positions = [graph_positions[i] for i in keep_idx]
        graph_contours = [graph_contours[i] for i in keep_idx]
        timer.stop("dedup")
        self.logger.info(f"detected cells after cleaning: {len(keep_idx)}")

        timer.start("serialize")
        outdir = wsi.patched_slide_path / "cell_detection"
        if subdir_name:
            outdir = outdir / subdir_name
        outdir.mkdir(parents=True, exist_ok=True)

        payload = {
            "wsi_metadata": wsi.metadata,
            "processed_patches": processed_patches,
            "type_map": nuclei_types,
            "cells": cell_dict_wsi,
        }
        (outdir / "cells.json").write_text(json.dumps(payload, indent=2))
        det_payload = dict(payload)
        det_payload["cells"] = cell_dict_detection
        (outdir / "cell_detection.json").write_text(
            json.dumps(det_payload, indent=2)
        )
        if geojson:
            (outdir / "cells.geojson").write_text(
                json.dumps(convert_geojson(cell_dict_wsi, True, type_names), indent=2)
            )
            (outdir / "cell_detection.geojson").write_text(
                json.dumps(convert_geojson(cell_dict_wsi, False, type_names), indent=2)
            )

        try:
            import torch

            graph = CellGraphDataWSI(
                x=torch.from_numpy(np.stack(graph_tokens))
                if graph_tokens
                else torch.zeros((0, 1)),
                positions=torch.from_numpy(np.stack(graph_positions))
                if graph_positions
                else torch.zeros((0, 2)),
                contours=[torch.from_numpy(np.asarray(c)) for c in graph_contours],
                metadata={
                    "wsi_metadata": wsi.metadata,
                    "nuclei_types": nuclei_types,
                },
            )
            torch.save(graph, outdir / "cells.pt")
        except ImportError:
            self.logger.warning("torch unavailable — skipping cells.pt graph")
        timer.stop("serialize")

        timings = {k: round(v, 4) for k, v in timer.summary().items()}
        n = max(len(processed_patches), 1)
        self.logger.info(
            "stage timings (s): "
            + ", ".join(f"{k}={v:.2f}" for k, v in timings.items())
            + f" | {timings.get('device_forward_postproc', 0.0) / n * 1e3:.1f}"
            f" ms/patch device"
        )
        (outdir / "timings.json").write_text(
            json.dumps({"stages_s": timings, "n_patches": len(processed_patches)})
        )
        self.logger.info(f"results written to {outdir}")
        return outdir
