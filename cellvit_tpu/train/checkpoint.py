"""Checkpoint save/load: native flax serialization + torch-format export.

Native checkpoints are msgpack (flax.serialization) + a JSON sidecar with
epoch/config metadata — resumable with optimizer state, mirroring the
reference's checkpoint keys (`base_ml/base_trainer.py:229-269`: epoch,
model/optimizer/scheduler state, config). `export_reference_checkpoint`
additionally writes a torch-pickle `.pth` in the reference's exact schema
via `checkpoint_io.export_torch_state_dict`, so models trained here load in
torch tooling unchanged.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(
    path: Path,
    state,
    trainer,
    epoch: int,
    extra_meta: Optional[Dict] = None,
) -> None:
    """Write `<path>.msgpack` + `<path>.json`."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    payload = {
        "params": host_state.params,
        "batch_stats": host_state.batch_stats,
        "opt_state": host_state.opt_state,
        "step": host_state.step,
    }
    path.with_suffix(".msgpack").write_bytes(serialization.to_bytes(payload))
    meta = {"epoch": epoch, **(extra_meta or {})}
    path.with_suffix(".json").write_text(json.dumps(meta, indent=2, default=str))


def load_checkpoint(path: Path, state_template) -> Tuple[Any, Dict]:
    """Restore a TrainState from `<path>.msgpack` using a freshly-created
    state as the structure template. Returns (state, metadata)."""
    path = Path(path)
    template = {
        "params": state_template.params,
        "batch_stats": state_template.batch_stats,
        "opt_state": state_template.opt_state,
        "step": state_template.step,
    }
    restored = serialization.from_bytes(
        template, path.with_suffix(".msgpack").read_bytes()
    )
    meta = {}
    if path.with_suffix(".json").exists():
        meta = json.loads(path.with_suffix(".json").read_text())
    new_state = state_template.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, meta


def export_reference_checkpoint(
    path: Path,
    state,
    arch: str,
    flat_config: Dict,
    epoch: int,
    sam_encoder: bool,
    run_name: str = "cellvit_tpu",
) -> None:
    """Write a torch `.pth` in the reference schema
    (base_trainer.py:229-251 keys)."""
    import torch

    from cellvit_tpu.models.checkpoint_io import export_torch_state_dict

    variables = {
        "params": jax.tree_util.tree_map(np.asarray, jax.device_get(state.params)),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, jax.device_get(state.batch_stats)
        ),
    }
    sd = export_torch_state_dict(variables, sam_encoder=sam_encoder)
    ckpt = {
        "arch": arch,
        "epoch": epoch,
        "model_state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
        "optimizer_state_dict": {},
        "scheduler_state_dict": {},
        "config": flat_config,
        "run_name": run_name,
        "wandb_id": None,
        "logdir": str(Path(path).parent),
        "best_metric": None,
        "best_epoch": None,
    }
    torch.save(ckpt, str(path))
