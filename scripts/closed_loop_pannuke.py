"""Closed train→eval loop at reference scale.

Generates a synthetic-but-separable PanNuke-format dataset (rendered
nuclei, type-coded colors — tests/synth.py), trains the real CellViT-256
architecture from scratch through the production CLI lifecycle
(`python -m cellvit_tpu.cli.run_cellvit --config …` → Experiment →
Trainer → orbax/msgpack checkpoints → post-training patch eval), then
checks that the PQ recovered from the SAVED checkpoint clears a
separability floor. This validates sampler / loss / unfreeze / checkpoint
/ metric wiring jointly — the reference lifecycle being mirrored is
`cell_segmentation/run_cellvit.py:30-103`.

Run on the TPU box (~15 min including compiles):

    python scripts/closed_loop_pannuke.py --out /tmp/closed_loop \
        --images 128 --epochs 40

The tiny-config CPU variant of the same loop runs as an `-m slow` test
(tests/test_experiment.py::test_closed_loop_recovers_separable_gt).
Measured results are recorded in docs/PARITY.md ("Closed-loop").
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build_config(dataset_path: Path, log_dir: Path, args) -> dict:
    return {
        "logging": {
            "mode": "offline",
            "log_dir": str(log_dir),
            "log_comment": "closed_loop",
            "level": "INFO",
        },
        "random_seed": 19,
        "gpu": 0,
        "data": {
            "dataset": "PanNuke",
            "dataset_path": str(dataset_path),
            "train_folds": [0],
            "val_folds": [1],
            "test_folds": [2],
            "num_nuclei_classes": 6,
            "input_shape": 256,
            "magnification": 40,
        },
        # the real CellViT-256 architecture (embed 384, depth 12), random
        # init — no pretrained iBOT weights exist in this environment
        "model": {"backbone": "ViT256"},
        "loss": {},
        "training": {
            "batch_size": args.batch,
            "epochs": args.epochs,
            "unfreeze_epoch": 0,  # nothing pretrained to freeze
            "optimizer": "AdamW",
            "optimizer_hyperparameter": {"lr": args.lr},
            "early_stopping_patience": 10 ** 6,
            "scheduler": {"scheduler_type": "cosine"},
            "sampling_strategy": "cell+tissue",
            "sampling_gamma": 0.85,
            "eval_every": max(1, args.epochs // 4),
            "mixed_precision": True,
        },
        "transformations": {
            "randomrotate90": {"p": 0.5},
            "horizontalflip": {"p": 0.5},
            "normalize": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]},
        },
        "eval_checkpoint": "latest_checkpoint",
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=Path, default=Path("/tmp/closed_loop"))
    ap.add_argument("--images", type=int, default=128,
                    help="images per fold (3 folds are generated)")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--min-bpq", type=float, default=0.6,
                    help="separability floor the recovered test bPQ must clear")
    args = ap.parse_args()

    from tests.synth import make_pannuke_dataset
    import yaml

    args.out.mkdir(parents=True, exist_ok=True)
    data_dir = args.out / "dataset"
    log_dir = args.out / "runs"
    if not (data_dir / "dataset_config.yaml").exists():
        print(f"generating dataset ({args.images} images × 3 folds, 256²)…")
        make_pannuke_dataset(
            data_dir, folds=(0, 1, 2), n_images=args.images, size=256
        )
    cfg_path = args.out / "train_config.yaml"
    cfg_path.write_text(yaml.safe_dump(build_config(data_dir, log_dir, args)))

    t0 = time.time()
    print(f"running CLI lifecycle: run_cellvit --config {cfg_path}")
    subprocess.run(
        [sys.executable, "-m", "cellvit_tpu.cli.run_cellvit",
         "--config", str(cfg_path)],
        check=True, cwd=REPO,
    )
    run_dirs = sorted(
        (d for d in log_dir.glob("*/") if (d / "config.yaml").exists()),
        key=lambda d: d.stat().st_mtime,
    )
    run_dir = run_dirs[-1]
    results = json.loads((run_dir / "inference_results.json").read_text())
    summary = {
        "run_dir": str(run_dir),
        "wall_s": round(time.time() - t0, 1),
        "epochs": args.epochs,
        "images_per_fold": args.images,
        "dataset": results["dataset"],
        "checkpoint": str(run_dir / "checkpoints" / "latest_checkpoint"),
    }
    print(json.dumps(summary, indent=2))
    bpq = results["dataset"]["bPQ"]
    if bpq < args.min_bpq:
        print(f"FAIL: recovered bPQ {bpq:.4f} < floor {args.min_bpq}")
        sys.exit(1)
    print(f"OK: recovered bPQ {bpq:.4f} ≥ {args.min_bpq}")


if __name__ == "__main__":
    main()
