"""Golden-metric comparison harness (SURVEY build-plan step 2).

The reference repository ships per-fold result JSONs but no model weights
(`logs_paper/PanNuke/.../inference_results.json`), so the golden-metric
reproduction cannot execute in this environment — this module makes it one
checkpoint download away: point patch inference at a run dir containing the
downloaded ``.pth`` and pass the reference fold directory, and every key of
the produced ``inference_results.json`` is diffed against the shipped one:

    python -m cellvit_tpu.inference.eval_pannuke \
        --run_dir <dir with config.yaml + checkpoints/CellViT-SAM-H.pth> \
        --checkpoint_name CellViT-SAM-H.pth \
        --reference-log .../logs_paper/PanNuke/CellViTHV/SAM-H/Fold-1

Reference schema: inference_cellvit_experiment_pannuke.py writes
{dataset, tissue_metrics, image_metrics, nuclei_metrics_pq,
nuclei_metrics_d}; eval_pannuke.py produces the same tree.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple, Union


def _flatten(d: Dict, prefix: str = "") -> Iterator[Tuple[str, object]]:
    for k, v in d.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _flatten(v, path + ".")
        else:
            yield path, v


def diff_inference_results(
    ours: Dict, reference: Dict, atol: float = 5e-3
) -> Dict:
    """Key-by-key diff of two inference_results trees.

    Returns a JSON-serializable report: per-key ours/reference/delta with a
    tolerance verdict, plus the keys present on only one side. NaN==NaN
    counts as agreement (the reference emits NaN for empty-GT classes).
    """
    ours_f = dict(_flatten(ours))
    ref_f = dict(_flatten(reference))
    per_key: Dict[str, Dict] = {}
    deltas = []
    for k in sorted(set(ours_f) & set(ref_f)):
        a, b = ours_f[k], ref_f[k]
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            both_nan = (
                isinstance(a, float) and isinstance(b, float)
                and math.isnan(a) and math.isnan(b)
            )
            delta = 0.0 if both_nan else abs(float(a) - float(b))
            per_key[k] = {
                "ours": a,
                "reference": b,
                "delta": delta,
                "within_tol": bool(delta <= atol),
            }
            # one-sided NaN yields delta=NaN: counted via within_tol=False
            # (NaN <= atol is False) but kept out of the max_abs_delta
            # reduction, where Python's max() is order-dependent on NaN.
            if not math.isnan(delta):
                deltas.append(delta)
        elif a != b:
            per_key[k] = {
                "ours": a, "reference": b, "delta": None, "within_tol": False
            }
    return {
        "atol": atol,
        "n_compared": sum(
            1 for v in per_key.values() if v["delta"] is not None
        ),
        "max_abs_delta": max(deltas, default=0.0),
        "n_outside_tol": sum(
            1 for v in per_key.values() if not v["within_tol"]
        ),
        "missing_in_ours": sorted(set(ref_f) - set(ours_f)),
        "missing_in_reference": sorted(set(ours_f) - set(ref_f)),
        "per_key": per_key,
    }


def compare_to_reference(
    results: Dict,
    reference_log: Union[str, Path],
    out_path: Optional[Union[str, Path]] = None,
    atol: float = 5e-3,
) -> Dict:
    """Diff `results` against a reference fold directory (or a direct path
    to its inference_results.json); optionally write the report."""
    ref_path = Path(reference_log)
    if ref_path.is_dir():
        ref_path = ref_path / "inference_results.json"
    reference = json.loads(ref_path.read_text())
    report = diff_inference_results(results, reference, atol=atol)
    report["reference_log"] = str(ref_path)
    if out_path is not None:
        Path(out_path).write_text(json.dumps(report, indent=2))
    return report
