"""Experiment CLI parser (reference `base_ml/base_cli.py:39-120`).

Flags: --config (YAML), --gpu (kept for CLI compatibility; selects the
device index), mutually exclusive --sweep/--agent/--checkpoint. CLI values
override the YAML config.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import Dict, Tuple

import yaml


def apply_platform_override() -> None:
    """Honor ``CELLVIT_PLATFORM`` (e.g. ``cpu``, ``tpu``): some TPU hosts
    pin ``jax_platforms`` programmatically in sitecustomize, so the
    ``JAX_PLATFORMS`` env var alone cannot force a platform; this sets the
    jax config directly before any backend initializes."""
    platform = os.environ.get("CELLVIT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


class ExperimentBaseParser:
    def __init__(self) -> None:
        parser = argparse.ArgumentParser(
            formatter_class=argparse.ArgumentDefaultsHelpFormatter,
            description="Start an experiment with given configuration file.",
        )
        parser.add_argument(
            "--config", type=str, help="Path to a config file", required=True
        )
        parser.add_argument("--gpu", type=int, help="Device to use")
        group = parser.add_mutually_exclusive_group(required=False)
        group.add_argument(
            "--sweep", action="store_true", help="Starting a sweep"
        )
        group.add_argument(
            "--agent", type=str, help="Add a new agent to the sweep (entity/project/sweep_id)"
        )
        group.add_argument(
            "--checkpoint", type=str, help="Path to a checkpoint to resume"
        )
        self.parser = parser

    def parse_arguments(self) -> Tuple[Dict, argparse.Namespace]:
        apply_platform_override()
        args = self.parser.parse_args()
        config_path = Path(args.config)
        if not config_path.exists():
            raise FileNotFoundError(f"config not found: {config_path}")
        with open(config_path) as f:
            config = yaml.safe_load(f)
        # CLI-only keys cannot come from the YAML (reference
        # base_cli.py:100-107) — a saved run config carries `checkpoint`,
        # and re-training from it must not silently resume
        for cli_only in ("run_sweep", "agent", "checkpoint"):
            config.pop(cli_only, None)
        if args.gpu is not None:
            config["gpu"] = args.gpu
        if args.checkpoint:
            config["checkpoint"] = args.checkpoint
        config["run_sweep"] = bool(args.sweep)
        config["agent"] = args.agent
        return config, args
