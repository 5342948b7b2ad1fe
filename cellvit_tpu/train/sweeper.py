"""Local hyperparameter sweeps (grid / random).

The reference delegates sweeps to wandb (`base_experiment.py:296-352` +
run_cellvit.py --sweep/--agent). wandb is optional here, so this module
provides a framework-owned executor with the same config schema: a `sweep`
block (method/name/metric/run_cap, validated by `train.validator`) and a
`parameters` block of dotted config paths with `values` lists (grid/random)
or `min`/`max` ranges (random). Results land in <log_dir>/sweep_results.json
with the best run by the sweep metric.
"""

from __future__ import annotations

import itertools
import json
import random as pyrandom
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from cellvit_tpu.train.experiment import flatten_dict, unflatten_dict
from cellvit_tpu.train.validator import validate_sweep_config


def enumerate_configs(sweep_cfg: Dict, parameters: Dict, seed: int = 0) -> List[Dict]:
    """Sweep spec → list of flattened {param_path: value} assignments."""
    method = sweep_cfg["method"]
    run_cap = sweep_cfg.get("run_cap")
    flat = flatten_dict(parameters)
    # group trailing min/max/values back onto their parameter path
    params: Dict[str, Dict] = {}
    for key, val in flat.items():
        path, leaf = key.rsplit(".", 1)
        if leaf in ("values", "min", "max", "value"):
            params.setdefault(path, {})[leaf] = val

    rng = pyrandom.Random(seed)
    if method == "grid":
        names, options = [], []
        for path, spec in sorted(params.items()):
            if "values" in spec:
                names.append(path)
                options.append(list(spec["values"]))
            elif "value" in spec:
                names.append(path)
                options.append([spec["value"]])
            else:
                raise ValueError(f"grid sweep needs `values` for {path}")
        combos = [dict(zip(names, vals)) for vals in itertools.product(*options)]
        if run_cap:
            combos = combos[:run_cap]
        return combos

    # random / bayes (bayes falls back to random sampling locally)
    n = run_cap or 10
    combos = []
    for _ in range(n):
        assignment = {}
        for path, spec in sorted(params.items()):
            if "values" in spec:
                assignment[path] = rng.choice(list(spec["values"]))
            elif "min" in spec and "max" in spec:
                lo, hi = spec["min"], spec["max"]
                if isinstance(lo, int) and isinstance(hi, int):
                    assignment[path] = rng.randint(lo, hi)
                else:
                    assignment[path] = rng.uniform(float(lo), float(hi))
            elif "value" in spec:
                assignment[path] = spec["value"]
        combos.append(assignment)
    return combos


def run_sweep(
    base_config: Dict,
    experiment_class,
    seed: int = 0,
) -> Tuple[Dict, List[Dict]]:
    """Run all sweep configurations; returns (best record, all records)."""
    sweep_cfg = validate_sweep_config(base_config.get("sweep", {}))
    metric_cfg = sweep_cfg.get("metric", {"name": "bPQ", "goal": "maximize"})
    metric_name = metric_cfg.get("name", "bPQ")
    maximize = metric_cfg.get("goal", "maximize") == "maximize"

    assignments = enumerate_configs(
        sweep_cfg, base_config.get("parameters", {}), seed=seed
    )
    records: List[Dict] = []
    for i, assignment in enumerate(assignments):
        cfg = unflatten_dict({**flatten_dict(base_config), **assignment})
        cfg.pop("sweep", None)
        cfg.pop("parameters", None)
        cfg.setdefault("logging", {})["log_comment"] = (
            f"{cfg['logging'].get('log_comment', 'sweep')}_run{i}"
        )
        experiment = experiment_class(cfg)
        run_dir, _, trainer, state = experiment.run_experiment()
        # last validation metrics from the metrics log
        metric_value = None
        metrics_file = Path(run_dir) / "metrics.jsonl"
        if metrics_file.exists():
            for line in metrics_file.read_text().strip().splitlines():
                rec = json.loads(line)
                if f"Validation/{metric_name}" in rec:
                    metric_value = rec[f"Validation/{metric_name}"]
        records.append(
            {
                "run": i,
                "assignment": assignment,
                "run_dir": str(run_dir),
                metric_name: metric_value,
            }
        )

    scored = [r for r in records if r[metric_name] is not None]
    best = (
        max(scored, key=lambda r: r[metric_name])
        if maximize
        else min(scored, key=lambda r: r[metric_name])
    ) if scored else {}
    out_dir = Path(base_config.get("logging", {}).get("log_dir", "runs"))
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "sweep_results.json").write_text(
        json.dumps({"best": best, "runs": records}, indent=2)
    )
    return best, records
