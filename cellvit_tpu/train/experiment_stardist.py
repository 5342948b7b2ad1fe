"""StarDist and CPP-Net experiments.

Reference parity: `experiments/experiment_stardist_pannuke.py` (loss
defaults: dist BCEWithLogits, rays L1LossWeighted, type xentropy+dice, no
default tissue loss) and `experiments/experiment_cpp_net_pannuke.py`
(adds stardist_map_refined L1LossWeighted). Datasets run with
`stardist=True` to emit dist/ray ground truth.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from cellvit_tpu.data.datasets import select_dataset
from cellvit_tpu.models.cpp_net import CellViT256CPP, CellViTCPP, CellViTSAMCPP
from cellvit_tpu.models.stardist import (
    CellViT256StarDist,
    CellViTSAMStarDist,
    CellViTStarDist,
)
from cellvit_tpu.train.experiment import ExperimentCellVitPanNuke
from cellvit_tpu.train.losses import retrieve_loss_fn
from cellvit_tpu.train.trainer_stardist import (
    CellViTCPPTrainer,
    CellViTStarDistTrainer,
)


class ExperimentCellViTStarDist(ExperimentCellVitPanNuke):
    dataset_name = "pannuke"
    stardist_labels = True

    LOSS_DEFAULTS = {
        "dist_map": {
            "bceweighted": {"loss_fn": "BCEWithLogitsLoss", "weight": 1},
        },
        "stardist_map": {
            "L1LossWeighted": {"loss_fn": "L1LossWeighted", "weight": 1},
        },
        "nuclei_type_map": {
            "bce": {"loss_fn": "xentropy_loss", "weight": 1},
            "dice": {"loss_fn": "dice_loss", "weight": 1},
        },
    }

    def get_loss_fn(self, loss_fn_settings: Dict) -> Dict:
        loss_fn_dict: Dict = {}
        branches = set(self.LOSS_DEFAULTS) | set(loss_fn_settings or {})
        for branch in branches:
            settings = (loss_fn_settings or {}).get(
                branch, self.LOSS_DEFAULTS.get(branch, {})
            )
            loss_fn_dict[branch] = {
                name: {
                    "loss_fn": retrieve_loss_fn(s["loss_fn"], **(s.get("args") or {})),
                    "weight": s.get("weight", 1),
                }
                for name, s in settings.items()
            }
        return loss_fn_dict

    def get_train_model(self):
        mcfg = self.run_conf["model"]
        tcfg = self.run_conf.get("training", {})
        data = self.run_conf["data"]
        backbone = str(mcfg.get("backbone", "default"))
        dtype = jnp.bfloat16 if tcfg.get("mixed_precision", False) else jnp.float32
        common = dict(
            num_nuclei_classes=data["num_nuclei_classes"],
            num_tissue_classes=len(self.dataset_config["tissue_types"]),
            nrays=mcfg.get("nrays", 32),
            drop_rate=tcfg.get("drop_rate", 0.0),
            dtype=dtype,
        )
        if backbone.upper().startswith("SAM"):
            return self.SAM_FACTORY(vit_structure=backbone, **common)
        if backbone.lower() in ("vit256", "vit-256"):
            return self.VIT256_FACTORY(**common)
        return self.BASE_CLASS(
            embed_dim=mcfg["embed_dim"],
            depth=mcfg["depth"],
            num_heads=mcfg["num_heads"],
            extract_layers=tuple(mcfg["extract_layers"]),
            encoder_type="histo",
            **common,
        )

    BASE_CLASS = CellViTStarDist
    VIT256_FACTORY = staticmethod(CellViT256StarDist)
    SAM_FACTORY = staticmethod(CellViTSAMStarDist)

    def get_datasets(self, train_transforms, val_transforms):
        data = dict(self.run_conf["data"])
        if not data.get("val_folds"):
            import warnings

            warnings.warn(
                "no val_folds configured — validation (and early stopping / "
                "model_best selection) will run on the TRAINING folds",
                stacklevel=2,
            )
        full_cfg = {
            "dataset_path": data["dataset_path"],
            "train_folds": data["train_folds"],
            "val_folds": data.get("val_folds", data["train_folds"]),
            "test_folds": data.get("test_folds", []),
        }
        train_ds = select_dataset(
            self.dataset_name, "train", full_cfg, transforms=train_transforms,
            stardist=True,
        )
        val_ds = select_dataset(
            self.dataset_name, "val", full_cfg, transforms=val_transforms,
            stardist=True,
        )
        return train_ds, val_ds

    def get_trainer(self):
        return CellViTStarDistTrainer


class ExperimentCellViTCPP(ExperimentCellViTStarDist):
    LOSS_DEFAULTS = {
        **ExperimentCellViTStarDist.LOSS_DEFAULTS,
        "stardist_map_refined": {
            "L1LossWeighted": {"loss_fn": "L1LossWeighted", "weight": 1},
        },
    }

    BASE_CLASS = CellViTCPP
    VIT256_FACTORY = staticmethod(CellViT256CPP)
    SAM_FACTORY = staticmethod(CellViTSAMCPP)

    def get_trainer(self):
        return CellViTCPPTrainer
