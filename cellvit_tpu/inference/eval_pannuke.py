"""PanNuke patch evaluation (reference
`inference/inference_cellvit_experiment_pannuke.py:222-1009`).

Runs test-fold patch inference and computes the full PanNuke metric suite:
per-image binary dice/jaccard, bPQ/bDQ/bSQ, per-type mPQ/mDQ/mSQ, tissue
accuracy, and detection F1/precision/recall from globally-paired centroids
(radius 12 at 40×, 6 at 20× — reference :911-914), plus per-tissue and
per-nuclei-type tables. Results land in `inference_results.json` with the
reference's key layout so runs are directly comparable against
`logs_paper/` fixtures.

Model forward + HV watershed run on device in batches; PQ pairing and
tables on host over the int32 label maps.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from cellvit_tpu.data.datasets import PanNukeDataset
from cellvit_tpu.data.loader import DataLoader, SequentialSampler
from cellvit_tpu.data.transforms import build_transforms
from cellvit_tpu.eval import metrics as M
from cellvit_tpu.ops.hv_postproc import instance_map_batch
from cellvit_tpu.utils.logger import Logger


def _per_instance_types(
    inst: np.ndarray, type_map: np.ndarray
) -> Dict[int, Dict]:
    """Majority-vote type + centroid per instance (host, vectorized)."""
    out: Dict[int, Dict] = {}
    ids = np.unique(inst)
    for i in ids:
        if i == 0:
            continue
        sel = inst == i
        ys, xs = np.nonzero(sel)
        vals, counts = np.unique(type_map[sel], return_counts=True)
        order = np.argsort(-counts, kind="stable")
        t = vals[order][0]
        if t == 0 and len(vals) > 1:
            t = vals[order][1]
        out[int(i)] = {
            "centroid": np.array([xs.mean(), ys.mean()]),
            "type": int(t),
        }
    return out


class InferenceCellViT:
    """Patch-inference evaluator over a training run directory."""

    model_family = "hv"  # "hv" | "stardist" | "cpp"

    def __init__(
        self,
        run_dir: Union[str, Path],
        checkpoint_name: str = "latest_checkpoint",
        magnification: int = 40,
        batch_size: int = 32,
    ) -> None:
        self.run_dir = Path(run_dir)
        self.checkpoint_name = checkpoint_name
        self.magnification = magnification
        self.batch_size = batch_size
        self.logger = Logger(level="INFO", log_dir=self.run_dir, comment="inference").create_logger()

        with open(self.run_dir / "config.yaml") as f:
            self.run_conf = yaml.safe_load(f)
        dataset_path = Path(self.run_conf["data"]["dataset_path"])
        with open(dataset_path / "dataset_config.yaml") as f:
            self.dataset_config = yaml.safe_load(f)
        self.num_classes = self.run_conf["data"]["num_nuclei_classes"]

        self._build_model()

    def _experiment_class(self):
        from cellvit_tpu.train.experiment import ExperimentCellVitPanNuke

        if self.model_family == "hv":
            return ExperimentCellVitPanNuke
        from cellvit_tpu.train.experiment_stardist import (
            ExperimentCellViTCPP,
            ExperimentCellViTStarDist,
        )

        return (
            ExperimentCellViTStarDist
            if self.model_family == "stardist"
            else ExperimentCellViTCPP
        )

    def _build_model(self) -> None:
        exp_cls = self._experiment_class()
        exp = exp_cls.__new__(exp_cls)
        exp.run_conf = self.run_conf
        exp.dataset_config = self.dataset_config
        self.model = exp.get_train_model()
        input_shape = self.run_conf["data"].get("input_shape", 256)
        variables = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, input_shape, input_shape, 3)),
            train=False,
        )
        ckpt_path = self.run_dir / "checkpoints" / self.checkpoint_name
        if ckpt_path.with_suffix(".msgpack").exists():
            from flax import serialization

            payload = serialization.msgpack_restore(
                ckpt_path.with_suffix(".msgpack").read_bytes()
            )
            self.variables = {
                "params": payload["params"],
                "batch_stats": payload["batch_stats"],
            }
        else:  # torch-format checkpoint in the run dir
            from cellvit_tpu.models.checkpoint_io import load_checkpoint

            _, self.variables, _ = load_checkpoint(str(ckpt_path))

        from cellvit_tpu.models.cellvit import CellViT as _CellViT
        from cellvit_tpu.models.fused import fused_forward

        if type(self.model) is _CellViT:
            # fused concat-free decoder towers (models/fused.py)
            self._forward = jax.jit(
                lambda v, x: fused_forward(self.model, v, x)
            )
        else:
            self._forward = jax.jit(
                lambda v, x: self.model.apply(v, x, train=False)
            )

    # --------------------------------------------------------------- data

    def setup_patch_inference(self) -> DataLoader:
        data = self.run_conf["data"]
        folds = data.get("test_folds") or data.get("val_folds")
        _, val_tf = build_transforms(
            self.run_conf.get("transformations", {}),
            input_shape=data.get("input_shape", 256),
        )
        ds = PanNukeDataset(
            data["dataset_path"], folds=folds, transforms=val_tf
        )
        return DataLoader(
            ds, batch_size=self.batch_size,
            sampler=SequentialSampler(len(ds)), num_workers=8,
        )

    # --------------------------------------------------------- postproc

    def _postprocess_batch(self, out, *, object_size: int, ksize: int):
        """Branch outputs → (instance maps, type argmax, binary argmax)."""
        np_prob = jax.nn.softmax(out["nuclei_binary_map"].astype(jnp.float32), -1)
        nt_prob = jax.nn.softmax(out["nuclei_type_map"].astype(jnp.float32), -1)
        inst = instance_map_batch(
            np_prob[..., 1], out["hv_map"].astype(jnp.float32),
            object_size=object_size, ksize=ksize,
        )
        return (
            np.asarray(inst),
            np.asarray(jnp.argmax(nt_prob, -1)),
            np.asarray(jnp.argmax(np_prob, -1)),
        )

    # --------------------------------------------------------------- run

    def run_patch_inference(self, loader: Optional[DataLoader] = None) -> Dict:
        loader = loader or self.setup_patch_inference()
        tissue_map = self.dataset_config["tissue_types"]
        ksize, object_size = (21, 10) if self.magnification == 40 else (11, 3)

        binary_dice, binary_jacc = [], []
        img_names: List[str] = []
        pq_s, dq_s, sq_s = [], [], []
        type_pq, type_dq, type_sq = [], [], []
        tissue_pred_all, tissue_gt_all, tissue_str = [], [], []
        paired_types: List[Tuple[int, int]] = []
        unpaired_true_types: List[int] = []
        unpaired_pred_types: List[int] = []
        radius = 12 if self.magnification == 40 else 6

        for raw in loader:
            imgs = jnp.asarray(raw["image"])
            out = self._forward(self.variables, imgs)
            inst_np, nt_argmax, np_argmax = self._postprocess_batch(
                out, object_size=object_size, ksize=ksize
            )
            tt_pred = np.asarray(jnp.argmax(out["tissue_types"], -1))

            batch_names = raw.get("names") or [
                f"img_{len(img_names) + i}" for i in range(inst_np.shape[0])
            ]
            img_names.extend(batch_names)
            gt_inst = raw["masks/instance_map"].astype(np.int32)
            gt_type = raw["masks/nuclei_type_map"].astype(np.int32)
            gt_bin = raw["masks/nuclei_binary_map"].astype(np.int32)
            tissue_gt = np.array([tissue_map[t] for t in raw["tissue_types"]])

            for i in range(inst_np.shape[0]):
                pred_bin = np_argmax[i]
                inter = ((pred_bin == 1) & (gt_bin[i] == 1)).sum()
                p_n, g_n = (pred_bin == 1).sum(), (gt_bin[i] == 1).sum()
                binary_dice.append(
                    float(2 * inter / (p_n + g_n)) if (p_n + g_n) else np.nan
                )
                union = p_n + g_n - inter
                binary_jacc.append(float(inter / union) if union else np.nan)

                pred_types_of_inst = _per_instance_types(inst_np[i], nt_argmax[i])
                gt_types_of_inst = _per_instance_types(gt_inst[i], gt_type[i])

                # binary PQ (nan when GT empty — reference :846-856)
                if len(np.unique(gt_inst[i])) == 1:
                    dq = sq = pq = np.nan
                else:
                    [dq, sq, pq], _ = M.get_fast_pq(
                        M.remap_label(gt_inst[i]), M.remap_label(inst_np[i])
                    )
                pq_s.append(pq), dq_s.append(dq), sq_s.append(sq)

                # per-class PQ over type-restricted instance maps
                t_pq, t_dq, t_sq = [], [], []
                for j in range(self.num_classes):
                    pred_j = np.where(
                        np.isin(
                            inst_np[i],
                            [k for k, v in pred_types_of_inst.items() if v["type"] == j],
                        ),
                        inst_np[i],
                        0,
                    )
                    gt_j = np.where(gt_type[i] == j, gt_inst[i], 0)
                    if len(np.unique(gt_j)) == 1:
                        vals = (np.nan, np.nan, np.nan)
                    else:
                        [d_, s_, p_], _ = M.get_fast_pq(
                            M.remap_label(gt_j), M.remap_label(pred_j)
                        )
                        vals = (d_, s_, p_)
                    t_dq.append(vals[0]), t_sq.append(vals[1]), t_pq.append(vals[2])
                type_pq.append(t_pq), type_dq.append(t_dq), type_sq.append(t_sq)

                # detection pairing
                tc = np.array(
                    [v["centroid"] for v in gt_types_of_inst.values()]
                ) if gt_types_of_inst else np.array([[0, 0]])
                tt = np.array(
                    [v["type"] for v in gt_types_of_inst.values()]
                ) if gt_types_of_inst else np.array([0])
                pc = np.array(
                    [v["centroid"] for v in pred_types_of_inst.values()]
                ) if pred_types_of_inst else np.array([[0, 0]])
                pt = np.array(
                    [v["type"] for v in pred_types_of_inst.values()]
                ) if pred_types_of_inst else np.array([0])
                paired, unp_t, unp_p = M.pair_coordinates(tc, pc, radius)
                for a, b in paired:
                    paired_types.append((int(tt[a]), int(pt[b])))
                unpaired_true_types.extend(tt[unp_t].tolist())
                unpaired_pred_types.extend(pt[unp_p].tolist())

            tissue_pred_all.extend(tt_pred.tolist())
            tissue_gt_all.extend(tissue_gt.tolist())
            tissue_str.extend([t.lower() for t in raw["tissue_types"]])

        # ------------------------------------------------- aggregation
        paired_true_t = np.array([a for a, _ in paired_types])
        paired_pred_t = np.array([b for _, b in paired_types])
        unp_true_t = np.array(unpaired_true_types)
        unp_pred_t = np.array(unpaired_pred_types)
        f1_d, prec_d, rec_d = M.cell_detection_scores(
            paired_true_t, paired_pred_t, unp_true_t, unp_pred_t
        )
        tissue_acc = float(
            np.mean(np.array(tissue_pred_all) == np.array(tissue_gt_all))
        )
        binary_dice = np.array(binary_dice)
        binary_jacc = np.array(binary_jacc)
        pq_arr = np.array(pq_s)

        dataset_metrics = {
            "Binary-Cell-Dice-Mean": float(np.nanmean(binary_dice)),
            "Binary-Cell-Jacard-Mean": float(np.nanmean(binary_jacc)),
            # the reference's StarDist/CPP eval scripts omit the tissue
            # accuracy from dataset metrics (their dataset_metrics dict at
            # inference_stardist_experiment_pannuke.py:432-445 has no
            # Tissue-Multiclass-Accuracy; the HV script adds it at
            # inference_cellvit_experiment_pannuke.py:458) — match each
            # family's schema exactly so golden diffs compare key-for-key
            **(
                {"Tissue-Multiclass-Accuracy": tissue_acc}
                if self.model_family == "hv"
                else {}
            ),
            "bPQ": float(np.nanmean(pq_arr)),
            "bDQ": float(np.nanmean(dq_s)),
            "bSQ": float(np.nanmean(sq_s)),
            "mPQ": float(np.nanmean([np.nanmean(p[1:]) for p in type_pq])),
            "mDQ": float(np.nanmean([np.nanmean(p[1:]) for p in type_dq])),
            "mSQ": float(np.nanmean([np.nanmean(p[1:]) for p in type_sq])),
            "f1_detection": float(f1_d),
            "precision_detection": float(prec_d),
            "recall_detection": float(rec_d),
        }

        tissue_metrics = {}
        tissue_arr = np.asarray(tissue_str)
        for tissue in self.dataset_config["tissue_types"]:
            sel = tissue_arr == tissue.lower()
            if not sel.any():
                continue
            tissue_metrics[tissue.lower()] = {
                "Dice": float(np.nanmean(binary_dice[sel])),
                "Jaccard": float(np.nanmean(binary_jacc[sel])),
                "bPQ": float(np.nanmean(pq_arr[sel])),
                "mPQ": float(
                    np.nanmean(
                        [np.nanmean(p[1:]) for p, s in zip(type_pq, sel) if s]
                    )
                ),
            }

        nuclei_metrics = {}
        for name, j in self.dataset_config["nuclei_types"].items():
            if j == 0:
                continue
            scores = np.array([p[j] for p in type_pq])
            f1, prec, rec = M.cell_type_detection_scores(
                paired_true_t, paired_pred_t, unp_true_t, unp_pred_t, j
            )
            nuclei_metrics[name] = {
                "PQ": float(np.nanmean(scores)),
                "f1": float(f1),
                "precision": float(prec),
                "recall": float(rec),
            }

        # per-image table (reference schema: {name: Dice/Jaccard/bPQ},
        # inference_cellvit_experiment_pannuke.py image_metrics).
        # Names missing (loader without "names") or duplicated across folds
        # would silently collapse rows — qualify repeats so every image
        # keeps its own entry.
        seen_names: Dict[str, int] = {}
        image_metrics = {}
        for i, name in enumerate(img_names):
            if not name:
                name = f"img_{i}"
            n_prev = seen_names.get(name, 0)
            seen_names[name] = n_prev + 1
            key = name if n_prev == 0 else f"{name}#{n_prev}"
            image_metrics[key] = {
                "Dice": float(binary_dice[i]),
                "Jaccard": float(binary_jacc[i]),
                "bPQ": float(pq_arr[i]),
            }

        results = {
            "dataset": dataset_metrics,
            "tissue_metrics": tissue_metrics,
            "image_metrics": image_metrics,
            "nuclei_metrics_pq": {
                k: v["PQ"] for k, v in nuclei_metrics.items()
            },
            # reference key names: f1_cell/prec_cell/rec_cell
            # (inference_cellvit_experiment_pannuke.py nuclei_metrics_d)
            "nuclei_metrics_d": {
                k: {
                    "f1_cell": v["f1"],
                    "prec_cell": v["precision"],
                    "rec_cell": v["recall"],
                }
                for k, v in nuclei_metrics.items()
            },
        }
        out_path = self.run_dir / "inference_results.json"
        out_path.write_text(json.dumps(results, indent=2))
        self.logger.info(f"wrote {out_path}")
        self.logger.info(json.dumps(dataset_metrics, indent=2))
        return results


def main() -> None:
    """CLI mirroring the reference's `InferenceCellViTParser`
    (inference_cellvit_experiment_pannuke.py:1206-1243); the evaluator
    family (HV / StarDist / CPP) is picked from the run config's model."""
    import argparse

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="CellViT PanNuke patch inference for a run directory",
    )
    parser.add_argument("--run_dir", type=str, required=True,
                        help="Logging directory of a training run")
    parser.add_argument("--checkpoint_name", type=str,
                        default="latest_checkpoint",
                        help="Checkpoint name inside run_dir/checkpoints")
    parser.add_argument("--gpu", type=int, default=0,
                        help="Device index (CLI compatibility)")
    parser.add_argument("--magnification", type=int, choices=(20, 40),
                        default=40)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument(
        "--family", type=str, choices=("hv", "stardist", "cpp"), default="hv",
        help="Decoder family of the run (the reference splits these across "
        "per-family inference scripts)",
    )
    parser.add_argument(
        "--reference-log", type=str, default=None,
        help="Reference logs_paper fold directory (or a direct path to its "
        "inference_results.json): every key of the produced results is "
        "diffed against it and the report written to "
        "run_dir/reference_diff.json (golden-metric harness — see "
        "inference/golden.py)",
    )
    parser.add_argument(
        "--tolerance", type=float, default=5e-3,
        help="Absolute per-metric tolerance for the --reference-log diff",
    )
    args = parser.parse_args()

    if args.family == "cpp":
        from cellvit_tpu.inference.eval_stardist import InferenceCellViTCPP as cls
    elif args.family == "stardist":
        from cellvit_tpu.inference.eval_stardist import (
            InferenceCellViTStarDist as cls,
        )
    else:
        cls = InferenceCellViT
    inf = cls(
        args.run_dir,
        checkpoint_name=args.checkpoint_name,
        magnification=args.magnification,
        batch_size=args.batch_size,
    )
    results = inf.run_patch_inference()
    if args.reference_log is not None:
        from cellvit_tpu.inference.golden import compare_to_reference

        report = compare_to_reference(
            results, args.reference_log,
            out_path=Path(args.run_dir) / "reference_diff.json",
            atol=args.tolerance,
        )
        inf.logger.info(
            "golden diff vs %s: %d keys compared, max |Δ| = %.5f, "
            "%d outside ±%g, %d reference keys missing here",
            args.reference_log, report["n_compared"],
            report["max_abs_delta"], report["n_outside_tol"],
            args.tolerance, len(report["missing_in_ours"]),
        )


if __name__ == "__main__":
    main()
