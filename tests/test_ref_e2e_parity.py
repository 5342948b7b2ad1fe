"""End-to-end logits parity against the reference torch implementation.

For every model family: build the reference torch model (random init), pull
its ``state_dict()``, convert it with ``checkpoint_io.convert_state_dict``,
and compare ALL output branches of a real forward pass at fp32. This is the
proof behind the "reference .pth checkpoints load unchanged" claim — any
layout/BN/ConvTranspose/rel-pos mismatch shows up as a logits diff.

Reference models: /root/reference/models/segmentation/cell_segmentation/
(cellvit.py:26-665, cellvit_shared.py:23-455, cellvit_stardist.py:28-433,
cellvit_cpp_net.py:167-631).

Inputs are 64² (pos-emb interpolation and SAM rel-pos interpolation paths are
exercised) so the suite stays fast; a full 256² CellViT256 check is marked
slow.
"""

import numpy as np
import pytest
import torch

from ref_oracle import load_reference_models

ref = load_reference_models()


def _compare(m_torch, model_jax, size=64, batch=2, atol=1e-4, seed=0):
    import jax
    import jax.numpy as jnp

    from cellvit_tpu.models.checkpoint_io import convert_state_dict

    m_torch = m_torch.eval()
    sam = model_jax.encoder_type == "sam"
    variables = convert_state_dict(m_torch.state_dict(), sam_encoder=sam, strict=True)

    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = m_torch(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = jax.jit(lambda v, a: model_jax.apply(v, a, train=False))(
        variables, jnp.asarray(x)
    )
    assert set(out_t.keys()) <= set(out_j.keys()), (
        f"missing branches: {set(out_t.keys()) - set(out_j.keys())}"
    )
    for k in out_t:
        a = out_t[k].numpy()
        b = np.asarray(out_j[k])
        if a.ndim == 4:
            a = a.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(b, a, atol=atol, rtol=1e-4, err_msg=k)


def test_cellvit256_e2e():
    from cellvit_tpu.models import CellViT256

    torch.manual_seed(0)
    m = ref.cellvit.CellViT256(None, num_nuclei_classes=6, num_tissue_classes=19)
    _compare(m, CellViT256(num_nuclei_classes=6, num_tissue_classes=19))


def test_cellvit256_regression_e2e():
    from cellvit_tpu.models import CellViT256

    torch.manual_seed(1)
    m = ref.cellvit.CellViT256(
        None, num_nuclei_classes=6, num_tissue_classes=19, regression_loss=True
    )
    _compare(
        m,
        CellViT256(num_nuclei_classes=6, num_tissue_classes=19, regression_loss=True),
    )


def test_cellvit_sam_b_e2e():
    from cellvit_tpu.models import CellViTSAM

    torch.manual_seed(2)
    m = ref.cellvit.CellViTSAM(
        None, num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-B"
    )
    _compare(
        m,
        CellViTSAM(
            num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-B"
        ),
        batch=1,
    )


def test_cellvit256_shared_e2e():
    from cellvit_tpu.models import CellViT256Shared

    torch.manual_seed(3)
    m = ref.cellvit_shared.CellViT256Shared(
        None, num_nuclei_classes=6, num_tissue_classes=19
    )
    _compare(m, CellViT256Shared(num_nuclei_classes=6, num_tissue_classes=19))


def test_cellvit256_stardist_e2e():
    from cellvit_tpu.models import CellViT256StarDist

    torch.manual_seed(4)
    m = ref.cellvit_stardist.CellViT256StarDist(
        None, num_nuclei_classes=6, num_tissue_classes=19, nrays=32
    )
    _compare(
        m, CellViT256StarDist(num_nuclei_classes=6, num_tissue_classes=19, nrays=32)
    )


def test_cellvit256_stardist_shared_e2e():
    from cellvit_tpu.models import CellViT256StarDistShared

    torch.manual_seed(5)
    m = ref.cellvit_stardist_shared.CellViT256StarDistShared(
        None, num_nuclei_classes=6, num_tissue_classes=19, nrays=32
    )
    _compare(
        m,
        CellViT256StarDistShared(
            num_nuclei_classes=6, num_tissue_classes=19, nrays=32
        ),
    )


def test_cellvit256_cpp_e2e():
    from cellvit_tpu.models import CellViT256CPP

    torch.manual_seed(6)
    m = ref.cellvit_cpp_net.CellViT256CPP(
        None, num_nuclei_classes=6, num_tissue_classes=19, nrays=32
    )
    _compare(m, CellViT256CPP(num_nuclei_classes=6, num_tissue_classes=19, nrays=32))


@pytest.mark.slow
def test_cellvit256_e2e_fullsize():
    from cellvit_tpu.models import CellViT256

    torch.manual_seed(7)
    m = ref.cellvit.CellViT256(None, num_nuclei_classes=6, num_tissue_classes=19)
    _compare(m, CellViT256(num_nuclei_classes=6, num_tissue_classes=19), size=256)


def test_stardist_rn50_e2e():
    """StarDist-RN50 logits parity vs the reference torch implementation
    (cpp_net_stardist_rn50.py:615-728): ResNet50 trunk (stem maxpool
    disabled), two bilinear align_corners=True U-Net towers, ray ReLU."""
    from cellvit_tpu.models.checkpoint_io import convert_rn50_state_dict
    from cellvit_tpu.models.stardist_rn50 import StarDistRN50

    import jax
    import jax.numpy as jnp

    rn50_mod = ref.cpp_net_stardist_rn50
    # pretrained=True would download torchvision weights (no egress);
    # random init exercises the identical graph
    orig_resnet50 = rn50_mod.resnet50
    rn50_mod.resnet50 = lambda pretrained=True, **kw: orig_resnet50(False, **kw)
    try:
        torch.manual_seed(11)
        m = rn50_mod.StarDistRN50(n_rays=8, n_seg_cls=6).eval()
    finally:
        rn50_mod.resnet50 = orig_resnet50
    # randomize BN stats so eval-mode normalization is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 2.0)

    variables = convert_rn50_state_dict(m.state_dict(), strict=True)
    model = StarDistRN50(n_rays=8, n_seg_cls=6)

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = jax.jit(lambda v, a: model.apply(v, a, train=False))(
        variables, jnp.asarray(x)
    )
    for k in ("dist_map", "stardist_map", "nuclei_type_map"):
        want = out_t[k].numpy().transpose(0, 2, 3, 1)
        got = np.asarray(out_j[k])
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4, err_msg=k)
