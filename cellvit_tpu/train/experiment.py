"""Experiment lifecycle: config → run directory → trained model.

Equivalent of the reference experiment layer (`base_ml/base_experiment.py:
39-403` + `experiments/experiment_cellvit_pannuke.py:69-848`): config
resolution with defaults, seeding, dataset/transform/sampler construction,
model factory with pretrained-encoder loading and freezing, loss-dict
assembly (same defaults), optimizer/scheduler, trainer.fit with early
stopping and checkpointing, and checkpoint-based resume.

Config schema matches `configs/examples/cell_segmentation/train_cellvit.yaml`
in the reference; the dataset directory must contain `dataset_config.yaml`
with `tissue_types` and `nuclei_types` name→id maps (same contract as the
reference's `load_dataset_setup`).
"""

from __future__ import annotations

import copy
import datetime
import random
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from cellvit_tpu.data.datasets import select_dataset
from cellvit_tpu.data.loader import DataLoader, RandomSampler, SequentialSampler, get_sampler
from cellvit_tpu.data.transforms import build_transforms
from cellvit_tpu.models.cellvit import CellViT, CellViT256, CellViTSAM
from cellvit_tpu.models.checkpoint_io import load_dino_encoder, load_sam_encoder
from cellvit_tpu.parallel import make_mesh
from cellvit_tpu.train import checkpoint as ckpt
from cellvit_tpu.train.early_stopping import EarlyStopping
from cellvit_tpu.train.losses import retrieve_loss_fn
from cellvit_tpu.train.optim import make_lr_schedule, retrieve_optimizer
from cellvit_tpu.train.trainer import CellViTTrainer
from cellvit_tpu.utils.logger import Logger, MetricLogger


def flatten_dict(d: Dict, sep: str = ".", prefix: str = "") -> Dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict) and v:
            out.update(flatten_dict(v, sep, key))
        else:
            out[key] = v
    return out


def unflatten_dict(d: Dict, sep: str = ".") -> Dict:
    out: Dict = {}
    for key, v in d.items():
        node = out
        parts = str(key).split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


class BaseExperiment:
    """Run-lifecycle owner (reference base_experiment.py:39-403)."""

    def __init__(self, default_conf: Dict, checkpoint: Optional[str] = None) -> None:
        self.default_conf = copy.deepcopy(default_conf)
        self.checkpoint_path = checkpoint
        self.run_conf: Dict = copy.deepcopy(default_conf)

    @staticmethod
    def seed_run(seed: int) -> jax.Array:
        random.seed(seed)
        np.random.seed(seed)
        try:
            import torch

            torch.manual_seed(seed)
        except ImportError:
            pass
        return jax.random.PRNGKey(seed)

    @staticmethod
    def extract_sweep_arguments(config: Dict) -> Dict:
        """Flatten nested sweep `parameters` blocks
        (base_experiment.py:296-330)."""
        sweep = config.get("sweep", {})
        params = flatten_dict(config.get("parameters", {}))
        out = {"method": sweep.get("method"), "name": sweep.get("name")}
        out["parameters"] = {
            k: v for k, v in params.items() if k.endswith(("min", "max", "values", "value"))
        }
        return out

    def overwrite_sweep_values(self, run_conf: Dict, sweep_values: Dict) -> Dict:
        """Apply flattened sweep-selected values onto the run config."""
        flat = flatten_dict(run_conf)
        flat.update(sweep_values)
        return unflatten_dict(flat)


class ExperimentCellVitPanNuke(BaseExperiment):
    """PanNuke CellViT training experiment."""

    dataset_name = "pannuke"
    # reference experiment_cellvit_pannuke.py:782-840
    allowed_sampling_strategies = ("random", "cell", "tissue", "cell+tissue")

    def __init__(self, default_conf: Dict, checkpoint: Optional[str] = None) -> None:
        super().__init__(default_conf, checkpoint)
        self.load_dataset_setup()

    def load_dataset_setup(self) -> None:
        path = Path(self.run_conf["data"]["dataset_path"]) / "dataset_config.yaml"
        with open(path) as f:
            self.dataset_config = yaml.safe_load(f)

    def num_tissue_classes(self) -> int:
        return len(self.dataset_config["tissue_types"])

    # ------------------------------------------------------------ pieces

    def get_loss_fn(self, loss_fn_settings: Dict) -> Dict:
        """Per-branch weighted loss dict with the reference defaults
        (experiment_cellvit_pannuke.py:282-413)."""
        defaults = {
            "nuclei_binary_map": {
                "bce": {"loss_fn": "xentropy_loss", "weight": 1},
                "dice": {"loss_fn": "dice_loss", "weight": 1},
            },
            "hv_map": {
                "mse": {"loss_fn": "mse_loss_maps", "weight": 1},
                "msge": {"loss_fn": "msge_loss_maps", "weight": 1},
            },
            "nuclei_type_map": {
                "bce": {"loss_fn": "xentropy_loss", "weight": 1},
                "dice": {"loss_fn": "dice_loss", "weight": 1},
            },
            "tissue_types": {
                "ce": {"loss_fn": "CrossEntropyLoss", "weight": 1},
            },
        }
        if self.run_conf["model"].get("regression_loss", False):
            defaults["regression_map"] = {
                "l1": {"loss_fn": "L1Loss", "weight": 1},
            }
        loss_fn_dict: Dict = {}
        branches = set(defaults) | set(loss_fn_settings or {})
        for branch in branches:
            settings = (loss_fn_settings or {}).get(branch, defaults.get(branch, {}))
            loss_fn_dict[branch] = {}
            for loss_name, sett in settings.items():
                loss_fn_dict[branch][loss_name] = {
                    "loss_fn": retrieve_loss_fn(
                        sett["loss_fn"], **(sett.get("args") or {})
                    ),
                    "weight": sett.get("weight", 1),
                }
        return loss_fn_dict

    def get_train_model(self) -> CellViT:
        mcfg = self.run_conf["model"]
        tcfg = self.run_conf.get("training", {})
        data = self.run_conf["data"]
        backbone = str(mcfg.get("backbone", "default"))
        dtype = jnp.bfloat16 if tcfg.get("mixed_precision", False) else jnp.float32
        common = dict(
            num_nuclei_classes=data["num_nuclei_classes"],
            num_tissue_classes=self.num_tissue_classes(),
            regression_loss=mcfg.get("regression_loss", False),
            drop_rate=tcfg.get("drop_rate", 0.0),
            dtype=dtype,
        )
        if backbone.upper().startswith("SAM"):
            return CellViTSAM(vit_structure=backbone, **common)
        if backbone.lower() in ("vit256", "vit-256"):
            return CellViT256(
                attn_drop_rate=tcfg.get("attn_drop_rate", 0.0),
                drop_path_rate=tcfg.get("drop_path_rate", 0.0),
                **common,
            )
        return CellViT(
            embed_dim=mcfg["embed_dim"],
            depth=mcfg["depth"],
            num_heads=mcfg["num_heads"],
            extract_layers=tuple(mcfg["extract_layers"]),
            encoder_type="histo",
            attn_drop_rate=tcfg.get("attn_drop_rate", 0.0),
            drop_path_rate=tcfg.get("drop_path_rate", 0.0),
            **common,
        )

    def load_pretrained(self, model: CellViT, variables: Dict) -> Dict:
        """Merge a pretrained encoder (DINO teacher / SAM) into init
        variables (reference cellvit.py:483-493, 574-584)."""
        mcfg = self.run_conf["model"]
        path = mcfg.get("pretrained_encoder")
        if not path:
            return variables
        if model.encoder_type == "sam":
            enc = load_sam_encoder(path)
        else:
            enc = load_dino_encoder(path)
        params = dict(variables["params"])
        merged = dict(params["encoder"])
        loaded = enc["params"]["encoder"]

        def deep_merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and k in dst:
                    deep_merge(dst[k], v)
                else:
                    dst[k] = jnp.asarray(v)

        deep_merge(merged, loaded)
        params["encoder"] = merged
        return {**variables, "params": params}

    def get_datasets(self, train_transforms, val_transforms) -> Tuple:
        data = dict(self.run_conf["data"])
        if "val_split" in data and data.get("val_split") and "val_folds" in data and data.get("val_folds"):
            raise RuntimeError("provide either val_split or val_folds, not both")
        if not data.get("val_folds") and not data.get("val_split"):
            import warnings

            warnings.warn(
                "neither val_folds nor val_split configured — validation "
                "(and early stopping / model_best selection) will run on "
                "the TRAINING folds",
                stacklevel=2,
            )
        full_cfg = {
            "dataset_path": data["dataset_path"],
            "train_folds": data["train_folds"],
            "val_folds": data.get("val_folds", data["train_folds"]),
            "test_folds": data.get("test_folds", []),
        }
        regression = self.run_conf["model"].get("regression_loss", False)
        train_ds = select_dataset(
            self.dataset_name, "train", full_cfg, transforms=train_transforms,
            regression=regression,
        )
        if data.get("val_split"):
            # split one dataset by index (seeded)
            n = len(train_ds)
            rng = np.random.default_rng(self.run_conf.get("random_seed", 19))
            idx = rng.permutation(n)
            n_val = int(n * float(data["val_split"]))
            val_ds = select_dataset(
                self.dataset_name, "train", full_cfg, transforms=val_transforms,
                regression=regression,
            )
            train_idx, val_idx = idx[n_val:], idx[:n_val]
            train_ds = _Subset(train_ds, train_idx)
            val_ds = _Subset(val_ds, val_idx)
        else:
            val_ds = select_dataset(
                self.dataset_name, "val", full_cfg, transforms=val_transforms,
                regression=regression,
            )
        return train_ds, val_ds

    # ------------------------------------------------------------ run

    def run_experiment(self) -> Tuple[Path, object, CellViTTrainer, object]:
        """Train; returns (run_dir, model, trainer, final state)."""
        cfg = self.run_conf
        seed = cfg.get("random_seed", 19)
        rng = self.seed_run(seed)

        log_cfg = cfg.get("logging", {})
        stamp = datetime.datetime.now().strftime("%Y-%m-%dT%H%M%S")
        comment = log_cfg.get("log_comment") or "cellvit"
        run_dir = Path(log_cfg.get("log_dir", "runs")) / f"{stamp}_{comment}"
        run_dir.mkdir(parents=True, exist_ok=True)
        (run_dir / "config.yaml").write_text(yaml.safe_dump(cfg))
        logger = Logger(
            level=log_cfg.get("level", "INFO") or "INFO", log_dir=run_dir
        ).create_logger()
        metric_logger = MetricLogger(
            run_dir,
            project=log_cfg.get("project"),
            run_name=f"{stamp}_{comment}",
            mode=log_cfg.get("mode", "offline") or "offline",
            config=flatten_dict(cfg),
        )

        tcfg = cfg["training"]
        model = self.get_train_model()
        input_shape = cfg["data"].get("input_shape", 256)
        variables = model.init(
            rng, jnp.zeros((1, input_shape, input_shape, 3)), train=False
        )
        variables = self.load_pretrained(model, variables)

        train_tf, val_tf = build_transforms(
            cfg.get("transformations", {}), input_shape=input_shape, seed=seed
        )
        train_ds, val_ds = self.get_datasets(train_tf, val_tf)
        strategy = tcfg.get("sampling_strategy", "random") or "random"
        if strategy.lower() not in self.allowed_sampling_strategies:
            raise NotImplementedError(
                f"sampling strategy {strategy!r} not supported for "
                f"{self.dataset_name}; allowed: {self.allowed_sampling_strategies}"
            )
        sampler = get_sampler(
            train_ds,
            strategy=strategy,
            gamma=tcfg.get("sampling_gamma", 1) or 1,
            seed=seed,
        )
        batch_size = tcfg["batch_size"]
        train_loader = DataLoader(
            train_ds, batch_size=batch_size, sampler=sampler, num_workers=16,
            drop_last=True,
        )
        val_loader = DataLoader(
            val_ds, batch_size=min(128, batch_size * 4),
            sampler=SequentialSampler(len(val_ds)), num_workers=16,
        )

        # the schedule's step counter advances once per optimizer EMIT step:
        # with gradient accumulation, optax.MultiSteps applies the inner
        # update every accum_steps micro-batches, so epochs must be counted
        # in emit steps or per-epoch schedules run accum_steps× too slowly
        accum = max(1, int(tcfg.get("accum_steps", 1) or 1))
        steps_per_epoch = max(1, len(train_loader) // accum)
        sch_cfg = tcfg.get("scheduler") or {}
        schedule = make_lr_schedule(
            sch_cfg.get("scheduler_type", "none") or "none",
            base_lr=tcfg.get("optimizer_hyperparameter", {}).get("lr", 1e-4),
            epochs=tcfg["epochs"],
            steps_per_epoch=steps_per_epoch,
            gamma=sch_cfg.get("gamma", 0.95),
            eta_min=sch_cfg.get("eta_min", 1e-5),
        )
        tx = retrieve_optimizer(
            tcfg.get("optimizer", "AdamW"),
            tcfg.get("optimizer_hyperparameter", {}),
            schedule,
        )

        import math

        n_dev = len(jax.devices())
        n_data = math.gcd(batch_size, n_dev)
        tissue_map = self.dataset_config["tissue_types"]
        trainer = self.get_trainer()(
            model=model,
            loss_fn_dict=self.get_loss_fn(cfg.get("loss", {})),
            optimizer=tx,
            num_classes=cfg["data"]["num_nuclei_classes"],
            tissue_types=tissue_map,
            mesh=make_mesh(n_data=n_data, n_model=1, devices=jax.devices()[: n_data]),
            magnification=cfg["data"].get("magnification", 40),
            accum_steps=tcfg.get("accum_steps", 1),
            log_dir=run_dir,
            metric_logger=metric_logger,
            logger=logger,
        )
        state = trainer.create_state(variables)

        start_epoch = 0
        if self.checkpoint_path:
            state, meta = ckpt.load_checkpoint(Path(self.checkpoint_path), state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            logger.info(f"resumed from {self.checkpoint_path} at epoch {start_epoch}")

        es = None
        if tcfg.get("early_stopping_patience"):
            es = EarlyStopping(tcfg["early_stopping_patience"], "maximize")

        state = trainer.fit(
            state,
            epochs=tcfg["epochs"],
            train_loader=train_loader,
            val_loader=val_loader,
            unfreeze_epoch=tcfg.get("unfreeze_epoch", 0) or 0,
            eval_every=tcfg.get("eval_every", 1) or 1,
            early_stopping=es,
            monitor="bPQ",
            checkpoint_dir=run_dir / "checkpoints",
            seed=seed,
            start_epoch=start_epoch,
        )
        metric_logger.close()

        # torch-schema export for interoperability (reference .pth layout)
        if cfg.get("export_torch_checkpoint", False):
            backbone = str(cfg["model"].get("backbone", "default"))
            if backbone.upper().startswith("SAM"):
                arch = "CellViTSAM"
            elif backbone.lower() in ("vit256", "vit-256"):
                arch = "CellViT256"
            else:
                arch = "CellViT"
            flat_cfg = flatten_dict(cfg)
            # the reference rebuilds models from the embedded config —
            # make sure the class counts are present
            flat_cfg.setdefault(
                "data.num_tissue_classes", self.num_tissue_classes()
            )
            try:
                ckpt.export_reference_checkpoint(
                    run_dir / "checkpoints" / "latest_checkpoint.pth",
                    state,
                    arch=arch,
                    flat_config=flat_cfg,
                    epoch=tcfg["epochs"] - 1,
                    sam_encoder=model.encoder_type == "sam",
                )
                logger.info("exported torch checkpoint latest_checkpoint.pth")
            except Exception as e:  # StarDist/CPP archs export via their own maps
                logger.warning(f"torch export failed: {e}")
        return run_dir, model, trainer, state

    def get_trainer(self):
        return CellViTTrainer


class ExperimentCellViTCoNic(ExperimentCellVitPanNuke):
    """CoNIC experiment (reference experiment_cellvit_conic.py).

    The delta vs PanNuke is tissue handling: CoNIC has no tissue labels, so
    the tissue CE loss branch is absent (conic.py:282 — branches are NB/HV/NT
    only), models are built with ``num_tissue_classes=1``
    (experiment_cellvit_conic.py:552,580,603), and only the "random"/"cell"
    sampling strategies exist (:771-798).
    """

    dataset_name = "conic"
    allowed_sampling_strategies = ("random", "cell")

    def num_tissue_classes(self) -> int:
        return 1

    def get_loss_fn(self, loss_fn_settings: Dict) -> Dict:
        settings = dict(loss_fn_settings or {})
        settings.pop("tissue_types", None)
        loss_fn_dict = super().get_loss_fn(settings)
        loss_fn_dict.pop("tissue_types", None)
        return loss_fn_dict


class _Subset:
    def __init__(self, dataset, indices) -> None:
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[int(self.indices[i])]

    def __getattr__(self, name):
        return getattr(self.dataset, name)
