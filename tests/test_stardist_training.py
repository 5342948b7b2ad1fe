"""StarDist/CPP experiment smoke tests: config → train → NMS validation,
plus the golden-metric harness over both families (reference ships
logs_paper result JSONs for CellViTStarDist and CellViTCPP too —
inference_stardist_experiment_pannuke.py / inference_cpp_net_…)."""

import json
from pathlib import Path

import numpy as np
import pytest

from tests.synth import make_pannuke_dataset
from tests.test_experiment import make_config


@pytest.fixture(scope="module")
def stardist_setup(tmp_path_factory):
    root = make_pannuke_dataset(
        tmp_path_factory.mktemp("pannuke_sd"), folds=(0, 1), n_images=4
    )
    log_dir = tmp_path_factory.mktemp("runs_sd")
    config = make_config(root, log_dir)
    config["training"]["epochs"] = 1
    return config  # nrays stays 32 — GT ray maps are generated with 32 rays


@pytest.fixture(scope="module")
def stardist_run(stardist_setup):
    from cellvit_tpu.train.experiment_stardist import ExperimentCellViTStarDist

    config = json.loads(json.dumps(stardist_setup))
    experiment = ExperimentCellViTStarDist(config)
    return experiment.run_experiment()  # (run_dir, model, trainer, state)


@pytest.fixture(scope="module")
def cpp_run(stardist_setup):
    from cellvit_tpu.train.experiment_stardist import ExperimentCellViTCPP

    config = json.loads(json.dumps(stardist_setup))
    experiment = ExperimentCellViTCPP(config)
    return experiment.run_experiment()


def test_stardist_experiment_runs(stardist_run):
    run_dir, *_ = stardist_run
    lines = (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    records = [json.loads(l) for l in lines]
    train_rec = next(r for r in records if "Train/Total_Loss" in r)
    assert np.isfinite(train_rec["Train/Total_Loss"])
    assert any("Train/dist_map_bceweighted" in r for r in records)
    assert any("Train/stardist_map_L1LossWeighted" in r for r in records)
    val_rec = next(r for r in records if "Validation/bPQ" in r)
    assert 0.0 <= val_rec["Validation/bPQ"] <= 1.0


def test_cpp_experiment_runs(cpp_run):
    run_dir, *_ = cpp_run
    records = [
        json.loads(l)
        for l in (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    ]
    assert any("Train/stardist_map_refined_L1LossWeighted" in r for r in records)


REF_LOGS = {
    "stardist": Path(
        "/root/reference/logs_paper/PanNuke/CellViTStarDist/ViT256/"
        "Our-Setting/Fold-1/inference_results.json"
    ),
    "cpp": Path(
        "/root/reference/logs_paper/PanNuke/CellViTCPP/SAM-H/"
        "CPP-Net-Setting/Fold-1/inference_results.json"
    ),
}


def _golden_checks(run_dir, family, monkeypatch):
    """Run the eval CLI for `family` with --reference-log self-diff, then
    schema-match the produced results against the REAL logs_paper file of
    that family (golden harness: inference/golden.py — every downloadable
    checkpoint family must be one download from verification)."""
    from cellvit_tpu.inference import eval_pannuke

    monkeypatch.setattr(
        "sys.argv",
        ["eval_pannuke", "--run_dir", str(run_dir), "--batch_size", "4",
         "--family", family, "--reference-log", str(run_dir)],
    )
    eval_pannuke.main()
    report = json.loads((run_dir / "reference_diff.json").read_text())
    assert report["n_compared"] > 10
    assert report["max_abs_delta"] == 0.0
    assert not report["missing_in_ours"] and not report["missing_in_reference"]

    ref_json = REF_LOGS[family]
    if not ref_json.exists():
        pytest.skip("reference logs_paper not available")
    ours = json.loads((run_dir / "inference_results.json").read_text())
    ref = json.loads(ref_json.read_text())
    # same sections + same dataset/tissue/per-image/per-type key sets —
    # the golden diff must compare like for like for this family's
    # downloadable checkpoints
    assert set(ours) == set(ref)
    assert set(ours["dataset"]) == set(ref["dataset"])
    assert set(next(iter(ours["image_metrics"].values()))) == set(
        next(iter(ref["image_metrics"].values()))
    )
    assert set(ours["nuclei_metrics_pq"]) == set(ref["nuclei_metrics_pq"])
    assert set(next(iter(ours["nuclei_metrics_d"].values()))) == set(
        next(iter(ref["nuclei_metrics_d"].values()))
    )


def test_stardist_golden_schema_matches_logs_paper(stardist_run, monkeypatch):
    run_dir, *_ = stardist_run
    _golden_checks(run_dir, "stardist", monkeypatch)


def test_cpp_golden_schema_matches_logs_paper(cpp_run, monkeypatch):
    run_dir, *_ = cpp_run
    _golden_checks(run_dir, "cpp", monkeypatch)
