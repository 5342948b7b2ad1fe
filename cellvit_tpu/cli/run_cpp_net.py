"""Train a CellViT-CPP-Net model (drop-in CLI for the reference
`cell_segmentation/run_cpp_net.py`).

Usage: python -m cellvit_tpu.cli.run_cpp_net --config train.yaml
"""

from __future__ import annotations


def main() -> None:
    from cellvit_tpu.cli.base_cli import ExperimentBaseParser
    from cellvit_tpu.train.experiment_stardist import ExperimentCellViTCPP

    config, args = ExperimentBaseParser().parse_arguments()
    if config.get("run_sweep"):
        from cellvit_tpu.train.sweeper import run_sweep

        best, _ = run_sweep(config, ExperimentCellViTCPP)
        print(f"sweep finished; best run: {best}")
        return
    if config.get("agent"):
        # join an existing sweep as an extra agent (reference
        # run_{name}.py agent mode; local claim-file protocol)
        import os

        from cellvit_tpu.train.sweeper import resolve_sweep_dir, run_agent

        sweep_dir = resolve_sweep_dir(config["agent"], config)
        best, _ = run_agent(
            sweep_dir, ExperimentCellViTCPP, agent_name=f"agent-{os.getpid()}"
        )
        print(f"agent finished; best run so far: {best}")
        return
    experiment = ExperimentCellViTCPP(config, checkpoint=config.get("checkpoint"))
    experiment.run_experiment()


if __name__ == "__main__":
    main()
