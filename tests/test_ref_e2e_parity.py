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
