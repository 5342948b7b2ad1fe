"""Golden-metric diff mechanics (inference/golden.py).

The end-to-end surface (CLI --reference-log over a trained run dir) is
covered in test_experiment.py; this exercises the diff semantics on pure
JSON trees, including the NaN conventions the reference's fold results use
for empty-GT classes."""

import json
import math

from cellvit_tpu.inference.golden import (
    compare_to_reference,
    diff_inference_results,
)


OURS = {
    "dataset": {"bPQ": 0.65, "mPQ": 0.49, "f1_detection": 0.82},
    "tissue_metrics": {"skin": {"Dice": 0.8, "bPQ": float("nan")}},
    "image_metrics": {"0_0.png": {"Dice": 0.91}},
    "nuclei_metrics_pq": {"Dead": float("nan")},
}


def test_self_diff_is_zero():
    r = diff_inference_results(OURS, json.loads(json.dumps(OURS)))
    assert r["max_abs_delta"] == 0.0
    assert r["n_outside_tol"] == 0
    assert not r["missing_in_ours"] and not r["missing_in_reference"]
    # NaN vs NaN counts as agreement (reference emits NaN for empty GT)
    assert r["per_key"]["nuclei_metrics_pq.Dead"]["within_tol"]


def test_drift_and_missing_keys_reported():
    ref = json.loads(json.dumps(OURS))
    ref["dataset"]["bPQ"] = 0.663  # 0.013 off, outside the 5e-3 default
    ref["dataset"]["mPQ"] = 0.492  # 0.002 off, inside
    del ref["image_metrics"]["0_0.png"]
    ref["dataset"]["extra_metric"] = 1.0
    r = diff_inference_results(OURS, ref)
    assert r["per_key"]["dataset.bPQ"]["within_tol"] is False
    assert r["per_key"]["dataset.mPQ"]["within_tol"] is True
    assert r["n_outside_tol"] == 1
    assert r["missing_in_ours"] == ["dataset.extra_metric"]
    assert r["missing_in_reference"] == ["image_metrics.0_0.png.Dice"]
    assert math.isclose(r["max_abs_delta"], 0.013, abs_tol=1e-9)


def test_nan_vs_number_is_flagged():
    ref = json.loads(json.dumps(OURS))
    ref["nuclei_metrics_pq"]["Dead"] = 0.3
    r = diff_inference_results(OURS, ref)
    assert r["per_key"]["nuclei_metrics_pq.Dead"]["within_tol"] is False
    # the NaN delta must not leak into the max reduction (Python max()
    # with NaN is order-dependent) — the summary stays a real number
    assert not math.isnan(r["max_abs_delta"])
    assert r["n_outside_tol"] >= 1


def test_compare_to_reference_accepts_fold_dir(tmp_path):
    (tmp_path / "inference_results.json").write_text(json.dumps(OURS))
    out = tmp_path / "reference_diff.json"
    r = compare_to_reference(OURS, tmp_path, out_path=out)
    assert r["max_abs_delta"] == 0.0
    assert json.loads(out.read_text())["n_compared"] == r["n_compared"]
    assert r["reference_log"].endswith("inference_results.json")
