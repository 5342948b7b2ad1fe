"""Train a CellViT model (drop-in CLI for the reference
`cell_segmentation/run_cellvit.py:30-103`).

Usage: python -m cellvit_tpu.cli.run_cellvit --config train.yaml
       [--checkpoint path] [--sweep | --agent id]

Selects the experiment class by config["data"]["dataset"] (PanNuke/CoNIC)
and, after training, runs the patch evaluation on the test folds.
"""

from __future__ import annotations


def main() -> None:
    from cellvit_tpu.cli.base_cli import ExperimentBaseParser
    from cellvit_tpu.train.experiment import (
        ExperimentCellViTCoNic,
        ExperimentCellVitPanNuke,
    )

    config, args = ExperimentBaseParser().parse_arguments()
    dataset = str(config["data"]["dataset"]).lower()
    if dataset == "pannuke":
        experiment_class = ExperimentCellVitPanNuke
    elif dataset == "conic":
        experiment_class = ExperimentCellViTCoNic
    else:
        raise NotImplementedError(f"unknown dataset {dataset}")

    if config.get("run_sweep"):
        from cellvit_tpu.train.sweeper import run_sweep

        best, _ = run_sweep(config, experiment_class)
        print(f"sweep finished; best run: {best}")
        return

    if config.get("agent"):
        # join an existing sweep as an extra agent (reference
        # run_cellvit.py:46-82 wandb.agent; local claim-file protocol)
        from cellvit_tpu.train.sweeper import resolve_sweep_dir, run_agent

        import os

        sweep_dir = resolve_sweep_dir(config["agent"], config)
        best, _ = run_agent(
            sweep_dir, experiment_class, agent_name=f"agent-{os.getpid()}"
        )
        print(f"agent finished; best run so far: {best}")
        return

    experiment = experiment_class(config, checkpoint=config.get("checkpoint"))
    run_dir, model, trainer, state = experiment.run_experiment()

    # post-training patch evaluation on the test folds (run_cellvit.py:85-102)
    if config["data"].get("test_folds"):
        from cellvit_tpu.inference.eval_pannuke import InferenceCellViT

        inference = InferenceCellViT(
            run_dir=run_dir,
            checkpoint_name=config.get("eval_checkpoint", "latest_checkpoint"),
            magnification=config["data"].get("magnification", 40),
        )
        inference.run_patch_inference()


if __name__ == "__main__":
    main()
