"""StarDist/CPP experiment smoke tests: config → train → NMS validation."""

import json

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


def test_stardist_experiment_runs(stardist_setup):
    from cellvit_tpu.train.experiment_stardist import ExperimentCellViTStarDist

    config = json.loads(json.dumps(stardist_setup))
    experiment = ExperimentCellViTStarDist(config)
    run_dir, model, trainer, state = experiment.run_experiment()
    lines = (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    records = [json.loads(l) for l in lines]
    train_rec = next(r for r in records if "Train/Total_Loss" in r)
    assert np.isfinite(train_rec["Train/Total_Loss"])
    assert any("Train/dist_map_bceweighted" in r for r in records)
    assert any("Train/stardist_map_L1LossWeighted" in r for r in records)
    val_rec = next(r for r in records if "Validation/bPQ" in r)
    assert 0.0 <= val_rec["Validation/bPQ"] <= 1.0


def test_cpp_experiment_runs(stardist_setup):
    from cellvit_tpu.train.experiment_stardist import ExperimentCellViTCPP

    config = json.loads(json.dumps(stardist_setup))
    experiment = ExperimentCellViTCPP(config)
    run_dir, model, trainer, state = experiment.run_experiment()
    records = [
        json.loads(l)
        for l in (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    ]
    assert any("Train/stardist_map_refined_L1LossWeighted" in r for r in records)
