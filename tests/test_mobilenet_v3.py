"""MobileNetV3-Small parity vs a torch oracle with torchvision's layout.

torchvision itself is not installed, so the oracle reconstructs
`mobilenet_v3_small`'s exact module tree (same state-dict keys, same
BN eps/padding/activations) in plain torch — the shipped
`tissue_detector.pt` checkpoint (reference patch_extraction.py:260-305)
uses precisely these keys.
"""

import numpy as np
import torch
import torch.nn as tnn

from cellvit_tpu.preprocessing.mobilenet_v3 import (
    MNV3_SMALL_CONFIG,
    MobileNetV3Small,
    _make_divisible,
    convert_mobilenet_state_dict,
    load_torch_tissue_detector,
)


def _cba(cin, cout, k, s, groups=1, act="hs"):
    layers = [
        tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups, bias=False),
        tnn.BatchNorm2d(cout, eps=0.001, momentum=0.01),
    ]
    if act == "hs":
        layers.append(tnn.Hardswish())
    elif act == "re":
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class _SE(tnn.Module):
    def __init__(self, c, squeeze):
        super().__init__()
        self.fc1 = tnn.Conv2d(c, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.relu(self.fc1(s))
        s = tnn.functional.hardsigmoid(self.fc2(s))
        return x * s


class _IR(tnn.Module):
    def __init__(self, cin, k, exp, out, se, hs, s):
        super().__init__()
        act = "hs" if hs else "re"
        mods = []
        if exp != cin:
            mods.append(_cba(cin, exp, 1, 1, act=act))
        mods.append(_cba(exp, exp, k, s, groups=exp, act=act))
        if se:
            mods.append(_SE(exp, _make_divisible(exp // 4, 8)))
        mods.append(_cba(exp, out, 1, 1, act="none"))
        self.block = tnn.Sequential(*mods)
        self.res = s == 1 and cin == out

    def forward(self, x):
        y = self.block(x)
        return x + y if self.res else y


class _TorchMNV3Small(tnn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        feats = [_cba(3, 16, 3, 2, act="hs")]
        cin = 16
        for k, exp, out, se, hs, s in MNV3_SMALL_CONFIG:
            feats.append(_IR(cin, k, exp, out, se, hs, s))
            cin = out
        feats.append(_cba(96, 576, 1, 1, act="hs"))
        self.features = tnn.Sequential(*feats)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.classifier = tnn.Sequential(
            tnn.Linear(576, 1024),
            tnn.Hardswish(),
            tnn.Dropout(0.2),
            tnn.Linear(1024, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x).flatten(1)
        return self.classifier(x)


def test_mobilenet_v3_small_logits_parity(rng):
    torch.manual_seed(0)
    oracle = _TorchMNV3Small(num_classes=4).eval()
    # randomize BN stats so eval-mode normalization is actually exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    variables = convert_mobilenet_state_dict(oracle.state_dict())
    model = MobileNetV3Small(num_classes=4)

    x = rng.uniform(-2, 2, (2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    import jax

    out = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_load_torch_tissue_detector_checkpoint(tmp_path, rng):
    """The shipped checkpoint format {'model_state_dict': ...} loads and
    the 4-class head is detected."""
    torch.manual_seed(1)
    oracle = _TorchMNV3Small(num_classes=4).eval()
    path = tmp_path / "tissue_detector.pt"
    torch.save({"model_state_dict": oracle.state_dict()}, path)

    model, variables = load_torch_tissue_detector(path)
    assert model.num_classes == 4
    x = rng.uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)
    out = model.apply(variables, x, train=False)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_filter_patches_with_torch_checkpoint(tmp_path, rng):
    """filter_patches drives the reference .pt checkpoint end-to-end:
    format dispatch, Resize(224)+ImageNet preprocessing, argmax filter."""
    import json

    from PIL import Image

    from cellvit_tpu.preprocessing.tissue_detector import filter_patches

    torch.manual_seed(2)
    oracle = _TorchMNV3Small(num_classes=4).eval()
    path = tmp_path / "tissue_detector.pt"
    torch.save({"model_state_dict": oracle.state_dict()}, path)

    wsi_dir = tmp_path / "wsi"
    (wsi_dir / "patches").mkdir(parents=True)
    entries = []
    arrs = []
    for i in range(4):
        arr = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        arrs.append(arr)
        name = f"p_{i}.png"
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            wsi_dir / "patches" / name
        )
        entries.append({name: {"row": 0, "col": i}})
    (wsi_dir / "patch_metadata.json").write_text(json.dumps(entries))

    # expected keep-set from the torch oracle with reference transforms
    from cellvit_tpu.preprocessing.mobilenet_v3 import preprocess_patch

    # round-trip through the stored png exactly as filter_patches reads it
    stored = [
        np.array(Image.open(wsi_dir / "patches" / f"p_{i}.png"), np.float32)
        / 255.0
        for i in range(4)
    ]
    batch = np.stack([preprocess_patch(a) for a in stored])
    with torch.no_grad():
        cls = (
            oracle(torch.from_numpy(batch.transpose(0, 3, 1, 2)))
            .argmax(-1)
            .numpy()
        )
    expected_keep = {f"p_{i}.png" for i in range(4) if cls[i] == 3}

    stats = filter_patches(wsi_dir, path, batch_size=2)
    kept = {
        next(iter(e))
        for e in json.loads((wsi_dir / "patch_metadata.json").read_text())
    }
    assert kept == expected_keep
    assert stats["kept"] == len(expected_keep)
