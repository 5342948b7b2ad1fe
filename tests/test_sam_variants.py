"""SAM-flagship de-risking (VERDICT r2 item 2).

(a) e2e torch logits parity for every SAM decoder variant at 64² —
    CellViTSAMShared (reference cellvit_shared.py:396), CellViTSAMStarDist
    (cellvit_stardist.py:306), CellViTSAMStarDistShared
    (cellvit_stardist_shared.py:437), CellViTSAMCPP (cellvit_cpp_net.py:486).
(b) SAM-B parity at 256² (slow): the 16×16 token grid pads to two 14-token
    windows per axis, so the real window partition/unpartition and rel-pos
    interpolation extents (image_encoder.py:128-193) are checked vs torch.
(c) SAM-L/H converter completeness: the torch models are built on the meta
    device (no param materialization); every state-dict key must map, and
    the resulting pytree must agree leaf-for-leaf in shape with
    `jax.eval_shape` of the flax init.
"""

import numpy as np
import pytest
import torch

from ref_oracle import load_reference_models
from test_ref_e2e_parity import _compare

ref = load_reference_models()


def test_cellvit_sam_shared_e2e():
    from cellvit_tpu.models import CellViTSAMShared

    torch.manual_seed(20)
    m = ref.cellvit_shared.CellViTSAMShared(
        None, num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-B"
    )
    _compare(
        m,
        CellViTSAMShared(
            num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-B"
        ),
        batch=1,
    )


def test_cellvit_sam_stardist_e2e():
    from cellvit_tpu.models import CellViTSAMStarDist

    torch.manual_seed(21)
    m = ref.cellvit_stardist.CellViTSAMStarDist(
        None,
        num_nuclei_classes=6,
        num_tissue_classes=19,
        vit_structure="SAM-B",
        nrays=32,
    )
    _compare(
        m,
        CellViTSAMStarDist(
            num_nuclei_classes=6,
            num_tissue_classes=19,
            vit_structure="SAM-B",
            nrays=32,
        ),
        batch=1,
    )


def test_cellvit_sam_stardist_shared_e2e():
    from cellvit_tpu.models import CellViTSAMStarDistShared

    torch.manual_seed(22)
    m = ref.cellvit_stardist_shared.CellViTSAMStarDistShared(
        None,
        num_nuclei_classes=6,
        num_tissue_classes=19,
        vit_structure="SAM-B",
        nrays=32,
    )
    _compare(
        m,
        CellViTSAMStarDistShared(
            num_nuclei_classes=6,
            num_tissue_classes=19,
            vit_structure="SAM-B",
            nrays=32,
        ),
        batch=1,
    )


def test_cellvit_sam_cpp_e2e():
    from cellvit_tpu.models import CellViTSAMCPP

    torch.manual_seed(23)
    m = ref.cellvit_cpp_net.CellViTSAMCPP(
        None,
        num_nuclei_classes=6,
        num_tissue_classes=19,
        vit_structure="SAM-B",
        nrays=32,
    )
    _compare(
        m,
        CellViTSAMCPP(
            num_nuclei_classes=6,
            num_tissue_classes=19,
            vit_structure="SAM-B",
            nrays=32,
        ),
        batch=1,
    )


@pytest.mark.slow
def test_cellvit_sam_b_e2e_256():
    """SAM-B at 256²: 16×16 token grid → real 14×14 window partition with
    padding + unpartition, rel-pos tables at true extents (reference
    image_encoder.py:128-193, 263-392)."""
    from cellvit_tpu.models import CellViTSAM

    torch.manual_seed(24)
    m = ref.cellvit.CellViTSAM(
        None, num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-B"
    )
    _compare(
        m,
        CellViTSAM(
            num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-B"
        ),
        size=256,
        batch=1,
        atol=3e-4,
    )


@pytest.mark.slow
def test_cellvit_sam_l_e2e():
    """SAM-L numerical e2e parity at 64² (the shape-completeness check
    below cannot catch transpose/layout errors that preserve shapes).
    Materializes the real 308M-param model: SAM-L's own global-attention
    indices [5,11,17,23], extract layers [6,12,18,24] and rel-pos tables
    (reference cellvit.py:652-658) are exercised with actual numerics."""
    from cellvit_tpu.models import CellViTSAM

    torch.manual_seed(25)
    m = ref.cellvit.CellViTSAM(
        None, num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-L"
    )
    _compare(
        m,
        CellViTSAM(
            num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-L"
        ),
        batch=1,
        atol=2e-4,
    )


@pytest.mark.slow
def test_cellvit_sam_h_e2e():
    """SAM-H (the headline mPQ-0.51 model) numerical e2e parity at 64²,
    materializing the real 632M-param model: global-attention indices
    [7,15,23,31], extract layers [8,16,24,32], d=1280/16 heads (reference
    cellvit.py:659-665)."""
    from cellvit_tpu.models import CellViTSAM

    torch.manual_seed(26)
    m = ref.cellvit.CellViTSAM(
        None, num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-H"
    )
    _compare(
        m,
        CellViTSAM(
            num_nuclei_classes=6, num_tissue_classes=19, vit_structure="SAM-H"
        ),
        batch=1,
        atol=2e-4,
    )


@pytest.mark.parametrize("vit_structure", ["SAM-L", "SAM-H"])
def test_sam_lh_converter_key_and_shape_completeness(vit_structure):
    """SAM-L/H checkpoint-converter check without materializing 300-600M
    params: torch model built on the meta device for its state-dict schema;
    `convert_state_dict(strict=True)` must map every key, and the converted
    pytree must match `jax.eval_shape` of the flax init leaf-for-leaf."""
    import jax
    import jax.numpy as jnp

    from cellvit_tpu.models import CellViTSAM
    from cellvit_tpu.models.checkpoint_io import convert_state_dict

    # vits_histo.py:339 does `torch.linspace(...).item()`, which meta
    # tensors refuse — pin factory output to CPU during construction
    orig_linspace = torch.linspace
    try:
        torch.linspace = lambda *a, **k: orig_linspace(
            *a, **{**k, "device": "cpu"}
        )
        with torch.device("meta"):
            m = ref.cellvit.CellViTSAM(
                None,
                num_nuclei_classes=6,
                num_tissue_classes=19,
                vit_structure=vit_structure,
            )
    finally:
        torch.linspace = orig_linspace
    shapes = {k: tuple(v.shape) for k, v in m.state_dict().items()}
    # zero-filled stand-ins (calloc-backed: virtual, never touched beyond
    # the converter's transposes)
    fake = {k: np.zeros(s, np.float32) for k, s in shapes.items()}
    variables = convert_state_dict(fake, sam_encoder=True, strict=True)

    model = CellViTSAM(
        num_nuclei_classes=6, num_tissue_classes=19, vit_structure=vit_structure
    )
    want = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
    )

    def leaf_shapes(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {
            jax.tree_util.keystr(path): tuple(np.shape(leaf))
            for path, leaf in flat
        }

    got_s, want_s = leaf_shapes(variables), leaf_shapes(want)
    assert set(got_s) == set(want_s), (
        f"pytree mismatch: extra={sorted(set(got_s) - set(want_s))[:8]} "
        f"missing={sorted(set(want_s) - set(got_s))[:8]}"
    )
    bad = {k: (got_s[k], want_s[k]) for k in got_s if got_s[k] != want_s[k]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:8])}"
