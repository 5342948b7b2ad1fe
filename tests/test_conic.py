"""CoNIC dataset + experiment smoke tests."""

import json

import numpy as np
import pytest

from tests.synth import make_conic_dataset


def test_conic_dataset(tmp_path):
    from cellvit_tpu.data.datasets import CoNicDataset

    root = make_conic_dataset(tmp_path, folds=(0,), n_images=4)
    ds = CoNicDataset(root, folds=[0])
    assert len(ds) == 4
    img, masks, tissue, name = ds[0]
    assert img.shape == (64, 64, 3)
    assert masks["hv_map"].shape == (64, 64, 2)
    ds.load_cell_count()
    w = ds.get_sampling_weights_cell(gamma=1.0)
    assert w.shape == (4,) and (w > 0).all()


def test_conic_experiment_one_epoch(tmp_path):
    from cellvit_tpu.train.experiment import ExperimentCellViTCoNic
    from tests.test_experiment import make_config

    root = make_conic_dataset(tmp_path / "data", folds=(0, 1), n_images=4)
    config = make_config(root, tmp_path / "runs")
    config["data"]["dataset"] = "conic"
    config["data"]["num_nuclei_classes"] = 7
    config["training"]["epochs"] = 1
    config["training"]["sampling_strategy"] = "cell"
    config["export_torch_checkpoint"] = True
    experiment = ExperimentCellViTCoNic(config)
    run_dir, model, trainer, state = experiment.run_experiment()
    records = [
        json.loads(l)
        for l in (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    ]
    assert any("Train/Total_Loss" in r for r in records)
    assert (run_dir / "checkpoints" / "latest_checkpoint.pth").exists()
    # exported torch checkpoint loads back through the converter
    from cellvit_tpu.models.checkpoint_io import load_checkpoint

    model2, variables2, conf2 = load_checkpoint(
        run_dir / "checkpoints" / "latest_checkpoint.pth"
    )
    assert conf2["data"]["num_nuclei_classes"] == 7
    # CoNIC parity (reference experiment_cellvit_conic.py): no tissue loss
    # branch, tissue head built with a single class.
    assert "tissue_types" not in trainer.loss_fn_dict
    assert model.num_tissue_classes == 1


def test_conic_rejects_tissue_sampling(tmp_path):
    from cellvit_tpu.train.experiment import ExperimentCellViTCoNic
    from tests.test_experiment import make_config

    root = make_conic_dataset(tmp_path / "data", folds=(0, 1), n_images=4)
    config = make_config(root, tmp_path / "runs")
    config["data"]["dataset"] = "conic"
    config["data"]["num_nuclei_classes"] = 7
    config["training"]["epochs"] = 1
    config["training"]["sampling_strategy"] = "cell+tissue"
    experiment = ExperimentCellViTCoNic(config)
    with pytest.raises(NotImplementedError, match="sampling strategy"):
        experiment.run_experiment()


def test_conic_loss_dict_ignores_tissue_settings(tmp_path):
    from cellvit_tpu.train.experiment import ExperimentCellViTCoNic
    from tests.test_experiment import make_config

    root = make_conic_dataset(tmp_path / "data", folds=(0,), n_images=2)
    config = make_config(root, tmp_path / "runs")
    config["data"]["dataset"] = "conic"
    experiment = ExperimentCellViTCoNic(config)
    loss_fn_dict = experiment.get_loss_fn(
        {"tissue_types": {"ce": {"loss_fn": "CrossEntropyLoss", "weight": 1}}}
    )
    assert "tissue_types" not in loss_fn_dict
    assert set(loss_fn_dict) == {"nuclei_binary_map", "hv_map", "nuclei_type_map"}
