"""MoNuSeg (and CoNSeP) test-set evaluation.

Reference parity: `inference/inference_cellvit_experiment_monuseg.py` —
whole-image 1024² evaluation or patched 256² (64 px overlap) with
overlap-aware cell merging, reporting binary dice/jaccard, bPQ and
detection F1/precision/recall at pairing radius 12 (40×) / 6 (20×).

Patched mode reuses the WSI machinery: per-patch device postprocessing,
global coordinates, margin codes and the grid-hash dedup — then the merged
cell set is re-rasterized into a full-image instance map for PQ.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Union

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from cellvit_tpu.data.datasets import MoNuSegDataset
from cellvit_tpu.eval import metrics as M
from cellvit_tpu.inference import dedup as dd
from cellvit_tpu.inference.eval_pannuke import InferenceCellViT, _per_instance_types
from cellvit_tpu.ops.hv_postproc import instance_map_batch
from cellvit_tpu.ops.instance_stats import contours_from_instance_map


class InferenceCellViTMoNuSeg(InferenceCellViT):
    """Evaluator over a MoNuSeg-format directory (images/ + labels/)."""

    def __init__(
        self,
        run_dir: Union[str, Path],
        dataset_path: Union[str, Path],
        checkpoint_name: str = "latest_checkpoint",
        magnification: int = 40,
        patching: bool = False,
        overlap: int = 64,
        patch_size: int = 256,
        batch_size: int = 8,
    ) -> None:
        super().__init__(
            run_dir, checkpoint_name=checkpoint_name,
            magnification=magnification, batch_size=batch_size,
        )
        self.dataset_path = Path(dataset_path)
        self.patching = patching
        self.overlap = overlap
        self.patch_size = patch_size

    def _infer_instances(self, img: np.ndarray):
        """Whole image or patched+merged → (instance map, inst dicts)."""
        ksize, object_size = (21, 10) if self.magnification == 40 else (11, 3)
        if not self.patching:
            out = self._forward(self.variables, jnp.asarray(img)[None])
            inst, nt, _ = self._postprocess_batch(
                out, object_size=object_size, ksize=ksize
            )
            return inst[0], _per_instance_types(inst[0], nt[0])

        p, ov = self.patch_size, self.overlap
        stride = p - ov
        h, w = img.shape[:2]

        def positions(n: int) -> List[int]:
            pos = list(range(0, n - p + 1, stride))
            if not pos or pos[-1] != n - p:
                # end-aligned patch so edges are covered; its enlarged
                # overlap with the previous tile is handled below by
                # per-side margin widths
                pos.append(n - p)
            return pos

        def side_margins(pos: List[int]) -> List[tuple]:
            """(before, after) margin width per grid index: the actual
            overlap with the neighboring tile when it exceeds the nominal
            `ov` (the end-aligned tile), else `ov` (reference semantics).
            A cell inside an enlarged overlap band is then margin-classed
            in both covering tiles, so `CellPostProcessor._remove_overlap`
            dedups it instead of it surviving twice as "mid"."""
            out = []
            for i, q in enumerate(pos):
                before = max(ov, pos[i - 1] + p - q) if i > 0 else ov
                after = max(ov, q + p - pos[i + 1]) if i < len(pos) - 1 else ov
                out.append((before, after))
            return out

        # batch the tile grid through the device (one forward per
        # batch_size tiles, not per tile — each dispatch pays tunnel RTT)
        ys, xs = positions(h), positions(w)
        my, mx = side_margins(ys), side_margins(xs)
        grid = [
            (yi, y0, xi, x0)
            for yi, y0 in enumerate(ys)
            for xi, x0 in enumerate(xs)
        ]
        tile_out: List = [None] * len(grid)
        bs = max(1, self.batch_size)
        for start in range(0, len(grid), bs):
            group = grid[start : start + bs]
            tiles = np.stack(
                [img[y0 : y0 + p, x0 : x0 + p] for _, y0, _, x0 in group]
            )
            out = self._forward(self.variables, jnp.asarray(tiles))
            inst_b, nt_b, _ = self._postprocess_batch(
                out, object_size=object_size, ksize=ksize
            )
            for j in range(len(group)):
                tile_out[start + j] = (np.asarray(inst_b[j]), np.asarray(nt_b[j]))

        cells: List[Dict] = []
        for (yi, y0, xi, x0), (inst0, nt0) in zip(grid, tile_out):
            contours = contours_from_instance_map(inst0)
            infos = _per_instance_types(inst0, nt0)
            for inst_id, contour in contours.items():
                if inst_id not in infos:
                    continue
                sel = inst0 == inst_id
                ys, xs = np.nonzero(sel)
                bbox = np.array(
                    [[ys.min(), xs.min()], [ys.max() + 1, xs.max() + 1]]
                )
                cells.append(
                    {
                        "contour": (contour + [[x0, y0]]).tolist(),
                        "centroid": (
                            infos[inst_id]["centroid"] + [x0, y0]
                        ).tolist(),
                        "type": infos[inst_id]["type"],
                        "cell_status": dd.get_cell_position_margin(
                            bbox,
                            p,
                            (my[yi][0], mx[xi][1], my[yi][1], mx[xi][0]),
                        ),
                        "patch_coordinates": [yi, xi],
                        "edge_position": bool(
                            bbox.max() == p or bbox.min() == 0
                        ),
                        "edge_information": {
                            "position": dd.get_cell_position(bbox, p),
                            "edge_patches": dd.get_edge_patch(
                                dd.get_cell_position(bbox, p), yi, xi,
                            ),
                        },
                    }
                )
        keep = dd.CellPostProcessor(cells).post_process_cells()
        merged = np.zeros((h, w), np.int32)
        infos: Dict[int, Dict] = {}
        for new_id, idx in enumerate(keep, start=1):
            contour = np.asarray(cells[idx]["contour"], np.int32)
            cv2.fillPoly(merged, [contour], new_id)
            infos[new_id] = {
                "centroid": np.asarray(cells[idx]["centroid"]),
                "type": cells[idx]["type"],
            }
        return merged, infos

    def run_inference(self) -> Dict:
        ds = MoNuSegDataset(self.dataset_path)
        radius = 12 if self.magnification == 40 else 6
        dices, jaccs, pqs = [], [], []
        tp = fp = fn = 0
        for i in range(len(ds)):
            img, mask, name = ds[i]
            gt_inst = mask[..., 0].astype(np.int32)
            norm = (self.run_conf.get("transformations") or {}).get("normalize", {})
            mean = np.asarray(norm.get("mean", (0.5, 0.5, 0.5)), np.float32)
            std = np.asarray(norm.get("std", (0.5, 0.5, 0.5)), np.float32)
            pred_inst, pred_info = self._infer_instances((img - mean) / std)

            pb, gb = pred_inst > 0, gt_inst > 0
            inter = (pb & gb).sum()
            dices.append(2 * inter / max(pb.sum() + gb.sum(), 1))
            jaccs.append(inter / max((pb | gb).sum(), 1))
            [_, _, pq], _ = M.get_fast_pq(
                M.remap_label(gt_inst), M.remap_label(pred_inst)
            )
            pqs.append(pq)

            gt_info = _per_instance_types(gt_inst, (gt_inst > 0).astype(np.int32))
            tc = np.array([v["centroid"] for v in gt_info.values()]) if gt_info else np.zeros((0, 2))
            pc = np.array([v["centroid"] for v in pred_info.values()]) if pred_info else np.zeros((0, 2))
            paired, unp_t, unp_p = M.pair_coordinates(tc, pc, radius)
            tp += len(paired)
            fn += len(unp_t)
            fp += len(unp_p)

        f1 = 2 * tp / max(2 * tp + fp + fn, 1)
        results = {
            "dataset": {
                "Binary-Cell-Dice-Mean": float(np.mean(dices)),
                "Binary-Cell-Jacard-Mean": float(np.mean(jaccs)),
                "bPQ": float(np.nanmean(pqs)),
                "f1_detection": float(f1),
                "precision_detection": float(tp / max(tp + fp, 1)),
                "recall_detection": float(tp / max(tp + fn, 1)),
            }
        }
        out_path = self.run_dir / "inference_monuseg_results.json"
        out_path.write_text(json.dumps(results, indent=2))
        self.logger.info(json.dumps(results["dataset"], indent=2))
        return results


def main() -> None:
    """CLI mirroring the reference's MoNuSeg parser
    (inference_cellvit_experiment_monuseg.py:975-1027)."""
    import argparse

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="CellViT MoNuSeg inference",
    )
    parser.add_argument("--run_dir", type=str, required=True,
                        help="Logging directory of a training run")
    parser.add_argument("--dataset", type=str, required=True,
                        help="MoNuSeg-format directory (images/ + labels/)")
    parser.add_argument("--checkpoint_name", type=str,
                        default="latest_checkpoint")
    parser.add_argument("--gpu", type=int, default=0,
                        help="Device index (CLI compatibility)")
    parser.add_argument("--magnification", type=int, choices=(20, 40),
                        default=40)
    parser.add_argument("--patching", action="store_true",
                        help="Tile to 256px patches and merge")
    parser.add_argument("--overlap", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=8)
    args = parser.parse_args()

    InferenceCellViTMoNuSeg(
        args.run_dir,
        args.dataset,
        checkpoint_name=args.checkpoint_name,
        magnification=args.magnification,
        patching=args.patching,
        overlap=args.overlap,
        batch_size=args.batch_size,
    ).run_inference()


if __name__ == "__main__":
    main()
