"""StarDist and CPP-Net trainers.

Reference parity: `cell_segmentation/trainer/trainer_stardist.py:36-628`
(branch unpack: type softmax + dist sigmoid; L1LossWeighted weighted by the
GT distance map; NMS-based validation PQ) and
`trainer/trainer_cpp_net.py:32-213` (adds the `stardist_map_refined`
branch). Reuses the jitted mesh-parallel step machinery of CellViTTrainer.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cellvit_tpu.eval import metrics as M
from cellvit_tpu.ops.stardist_nms import StarDistPostProcessor
from cellvit_tpu.train.trainer import CellViTTrainer


class CellViTStarDistTrainer(CellViTTrainer):
    """Trainer for the dist/stardist/type branch layout."""

    def unpack_predictions(self, out: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        preds = dict(out)
        preds["nuclei_type_map"] = jax.nn.softmax(out["nuclei_type_map"], axis=-1)
        # dist_map stays logits for BCEWithLogits; sigmoid for postproc
        preds["dist_map_sigmoid"] = jax.nn.sigmoid(out["dist_map"])
        return preds

    def assemble_gt(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        gt = {
            "nuclei_type_map": jax.nn.one_hot(
                batch["nuclei_type_map"], self.num_classes
            ),
            "nuclei_binary_map": jax.nn.one_hot(batch["nuclei_binary_map"], 2),
            "dist_map": batch["dist_map"][..., None],
            "stardist_map": batch["stardist_map"],
            "tissue_types": batch["tissue_types"],
        }
        return gt

    def calculate_loss(self, preds, gt):
        total = jnp.zeros((), jnp.float32)
        parts: Dict[str, jnp.ndarray] = {}
        for branch, branch_losses in self.loss_fn_dict.items():
            if branch not in preds or branch not in gt:
                continue
            for loss_name, setting in branch_losses.items():
                fn, weight = setting["loss_fn"], setting["weight"]
                lname = loss_name.lower()
                if lname == "msge":
                    value = fn(preds[branch], gt[branch], focus=gt["nuclei_binary_map"])
                elif lname == "l1lossweighted":
                    value = fn(
                        preds[branch], gt[branch],
                        target_weight=gt["dist_map"][..., 0],
                    )
                else:
                    value = fn(preds[branch], gt[branch])
                parts[f"{branch}_{loss_name}"] = value
                total = total + weight * value
        return total, parts

    def _device_metrics(self, preds, batch):
        pred_bin = (preds["dist_map_sigmoid"][..., 0] > 0.5).astype(jnp.int32)
        gt_bin = batch["nuclei_binary_map"]
        inter = jnp.sum((pred_bin == 1) & (gt_bin == 1))
        pred_n = jnp.sum(pred_bin == 1)
        gt_n = jnp.sum(gt_bin == 1)
        dice = (2.0 * inter + 1e-6) / (pred_n + gt_n + 1e-6)
        jacc = (inter + 1e-6) / (pred_n + gt_n - inter + 1e-6)
        acc = jnp.mean(
            (
                jnp.argmax(preds["tissue_types"], axis=-1) == batch["tissue_types"]
            ).astype(jnp.float32)
        )
        return {"dice": dice, "jaccard": jacc, "tissue_acc": acc}

    # validation PQ via NMS postprocessing (host)
    RAY_BRANCH = "stardist_map"

    def _batch_pq(self, preds, inst_gt: np.ndarray) -> List[float]:
        dist = np.asarray(preds["dist_map_sigmoid"][..., 0])
        rays = np.asarray(preds[self.RAY_BRANCH])
        proc = StarDistPostProcessor(
            nr_types=self.num_classes, image_shape=dist.shape[1:]
        )
        out = []
        for i in range(dist.shape[0]):
            inst, _, _ = proc.post_proc_stardist(
                dist[i], rays[i],
                np.asarray(preds["nuclei_type_map"][i]),
            )
            true = M.remap_label(np.asarray(inst_gt[i]))
            [_, _, pq], _ = M.get_fast_pq(true, M.remap_label(inst))
            out.append(pq)
        return out


class CellViTCPPTrainer(CellViTStarDistTrainer):
    """CPP-Net trainer: refined rays drive the loss extra branch and the
    validation postprocessing (reference trainer_cpp_net.py:32-213)."""

    RAY_BRANCH = "stardist_map_refined"

    def assemble_gt(self, batch):
        gt = super().assemble_gt(batch)
        # refined branch is trained against the same GT ray map
        gt["stardist_map_refined"] = batch["stardist_map"]
        return gt
