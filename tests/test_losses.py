"""Loss library tests: torch-functional oracles + hand-computed invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cellvit_tpu.train import losses


def test_registry_complete():
    expected = {
        "xentropy_loss", "dice_loss", "mse_loss_maps", "msge_loss_maps",
        "FocalTverskyLoss", "MCFocalTverskyLoss", "CrossEntropyLoss",
        "L1Loss", "MSELoss", "NLLLoss", "PoissonNLLLoss", "GaussianNLLLoss",
        "KLDivLoss", "BCELoss", "BCEWithLogitsLoss", "MarginRankingLoss",
        "HingeEmbeddingLoss", "HuberLoss", "SmoothL1Loss", "SoftMarginLoss",
        "MultiLabelSoftMarginLoss", "CosineEmbeddingLoss", "TripletMarginLoss",
        "MAEWeighted", "MSEWeighted", "BCEWeighted", "CEWeighted",
        "L1LossWeighted", "CTCLoss", "MultiMarginLoss",
        "MultiLabelMarginLoss", "TripletMarginWithDistanceLoss",
    }
    assert expected <= set(losses.LOSS_DICT)


def test_ctc_matches_torch(rng):
    T, B, C, S = 12, 3, 7, 4
    logits = rng.standard_normal((T, B, C), dtype=np.float32)
    log_probs = torch.from_numpy(logits).log_softmax(-1)
    targets = torch.from_numpy(rng.integers(1, C, (B, S)).astype(np.int64))
    in_len = torch.tensor([12, 10, 8])
    tg_len = torch.tensor([4, 3, 2])
    ref = F.ctc_loss(log_probs, targets, in_len, tg_len, blank=0).item()
    out = float(losses.retrieve_loss_fn("CTCLoss")(
        jnp.asarray(log_probs.numpy()), jnp.asarray(targets.numpy()),
        jnp.asarray(in_len.numpy()), jnp.asarray(tg_len.numpy()),
    ))
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_multi_margin_matches_torch(rng):
    x = rng.standard_normal((6, 9), dtype=np.float32)
    y = rng.integers(0, 9, 6)
    for p, margin in [(1, 1.0), (2, 0.7)]:
        ref = F.multi_margin_loss(
            torch.from_numpy(x), torch.from_numpy(y), p=p, margin=margin
        ).item()
        out = float(losses.retrieve_loss_fn("MultiMarginLoss", p=p, margin=margin)(
            jnp.asarray(x), jnp.asarray(y)
        ))
        np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_multilabel_margin_matches_torch(rng):
    x = rng.standard_normal((5, 8), dtype=np.float32)
    y = np.full((5, 8), -1, np.int64)
    for b in range(5):
        k = rng.integers(1, 5)
        y[b, :k] = rng.choice(8, size=k, replace=False)
    ref = F.multilabel_margin_loss(torch.from_numpy(x), torch.from_numpy(y)).item()
    out = float(losses.retrieve_loss_fn("MultiLabelMarginLoss")(
        jnp.asarray(x), jnp.asarray(y)
    ))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_triplet_with_distance_matches_torch(rng):
    a, p, n = (rng.standard_normal((7, 16), dtype=np.float32) for _ in range(3))
    for swap in (False, True):
        ref = F.triplet_margin_with_distance_loss(
            torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n),
            margin=0.8, swap=swap,
        ).item()
        out = float(losses.retrieve_loss_fn(
            "TripletMarginWithDistanceLoss", margin=0.8, swap=swap
        )(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)))
        np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((4, 8, 8, 5), dtype=np.float32)
    target = rng.integers(0, 5, (4, 8, 8))
    ref = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)), torch.from_numpy(target)
    ).item()
    out = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert out == pytest.approx(ref, rel=1e-5)


def test_bce_with_logits_matches_torch(rng):
    x = rng.standard_normal((4, 6), dtype=np.float32)
    t = (rng.random((4, 6)) > 0.5).astype(np.float32)
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(t)
    ).item()
    out = float(losses.bce_with_logits_loss(jnp.asarray(x), jnp.asarray(t)))
    assert out == pytest.approx(ref, rel=1e-5)


@pytest.mark.parametrize(
    "name,fn_torch",
    [
        ("huber_loss", lambda a, b: F.huber_loss(a, b)),
        ("smooth_l1_loss", lambda a, b: F.smooth_l1_loss(a, b)),
        ("l1_loss", lambda a, b: F.l1_loss(a, b)),
        ("mse_loss", lambda a, b: F.mse_loss(a, b)),
    ],
)
def test_elementwise_losses_match_torch(rng, name, fn_torch):
    a = rng.standard_normal((5, 7), dtype=np.float32) * 3
    b = rng.standard_normal((5, 7), dtype=np.float32)
    ref = fn_torch(torch.from_numpy(a), torch.from_numpy(b)).item()
    out = float(getattr(losses, name)(jnp.asarray(a), jnp.asarray(b)))
    assert out == pytest.approx(ref, rel=1e-5)


def test_xentropy_perfect_prediction_low():
    t = jax.nn.one_hot(jnp.zeros((2, 4, 4), jnp.int32), 2)
    good = float(losses.xentropy_loss(t, t))
    bad = float(losses.xentropy_loss(1.0 - t, t))
    assert good < 1e-5 and bad > 5.0


def test_dice_perfect_prediction_zero():
    t = jax.nn.one_hot(jnp.asarray(np.random.default_rng(0).integers(0, 2, (2, 8, 8))), 2)
    assert float(losses.dice_loss(t, t)) < 1e-2
    assert float(losses.dice_loss(1.0 - t, t)) > 1.5


def test_hv_gradient_conv_matches_torch(rng):
    """The MSGE 5×5 gradient kernels applied with torch conv semantics."""
    hv = rng.standard_normal((2, 16, 16, 2), dtype=np.float32)
    kh, kv = losses._hv_sobel_kernels(5)
    h_t = F.conv2d(
        torch.from_numpy(hv[..., 0])[:, None],
        torch.from_numpy(kh)[None, None],
        padding=2,
    )[:, 0].numpy()
    out = np.asarray(losses.get_gradient_hv(jnp.asarray(hv)))
    np.testing.assert_allclose(out[..., 0], h_t, rtol=1e-4, atol=1e-5)


def test_msge_focus_masks_background(rng):
    hv_pred = jnp.asarray(rng.standard_normal((1, 16, 16, 2), dtype=np.float32))
    hv_true = jnp.asarray(rng.standard_normal((1, 16, 16, 2), dtype=np.float32))
    focus_none = jnp.zeros((1, 16, 16, 2))
    focus_all = jnp.stack(
        [jnp.zeros((1, 16, 16)), jnp.ones((1, 16, 16))], axis=-1
    )
    assert float(losses.msge_loss_maps(hv_pred, hv_true, focus_none)) == 0.0
    assert float(losses.msge_loss_maps(hv_pred, hv_true, focus_all)) > 0.0


def test_msge_accepts_bf16_predictions(rng):
    """bf16 model preds vs fp32 GT must not crash the gradient conv
    (conv_general_dilated requires matching dtypes — regression: the
    frozen-encoder bf16 train step died here) and the loss stays fp32."""
    hv_pred = jnp.asarray(
        rng.standard_normal((1, 16, 16, 2), dtype=np.float32)
    ).astype(jnp.bfloat16)
    hv_true = jnp.asarray(rng.standard_normal((1, 16, 16, 2), dtype=np.float32))
    focus = jnp.stack([jnp.zeros((1, 16, 16)), jnp.ones((1, 16, 16))], axis=-1)
    v = losses.msge_loss_maps(hv_pred, hv_true, focus)
    assert v.dtype == jnp.float32 and np.isfinite(float(v))
    g = jax.grad(lambda p: losses.msge_loss_maps(p, hv_true, focus))(hv_pred)
    assert g.dtype == jnp.bfloat16 and bool(jnp.all(jnp.isfinite(g)))


def test_focal_tversky_ranges(rng):
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 2), dtype=np.float32))
    target = jnp.asarray(rng.integers(0, 2, (2, 8, 8)))
    v = float(losses.focal_tversky_loss(logits, target))
    assert 0.0 <= v <= 1.0
    # strongly correct logits → near-zero loss
    good = jax.nn.one_hot(target, 2) * 20.0 - 10.0
    assert float(losses.focal_tversky_loss(good, target)) < 1e-3


def test_mc_focal_tversky_weighting(rng):
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 3), dtype=np.float32))
    target = jnp.asarray(rng.integers(0, 3, (2, 8, 8)))
    base = float(losses.mc_focal_tversky_loss(logits, target, num_classes=3))
    double = float(
        losses.mc_focal_tversky_loss(
            logits, target, num_classes=3, class_weights=[2, 2, 2]
        )
    )
    assert double == pytest.approx(2 * base, rel=1e-5)


def test_mae_weighted_mask_and_background_reg(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2), dtype=np.float32))
    t = jnp.asarray(rng.standard_normal((1, 8, 8, 2), dtype=np.float32))
    mask = jnp.zeros((1, 8, 8))
    # fully masked: only the alpha background-regularization term remains
    v = float(losses.mae_weighted(x, t, mask=mask, apply_mask=True, alpha=1.0))
    expect = float(jnp.mean(jnp.mean(jnp.abs(x), -1)))
    assert v == pytest.approx(expect, rel=1e-4)


def test_ce_weighted_matches_plain_ce_when_unweighted(rng):
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))
    target = jnp.asarray(rng.integers(0, 4, (2, 8, 8)))
    a = float(losses.ce_weighted(logits, target))
    b = float(losses.cross_entropy_loss(logits, target))
    assert a == pytest.approx(b, abs=1e-4)


def test_l1_loss_weighted_with_weights(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3), dtype=np.float32))
    t = jnp.zeros_like(x)
    w = jnp.ones((2, 4, 4)) * 2.0
    assert float(losses.l1_loss_weighted(x, t, w)) == pytest.approx(
        2 * float(losses.l1_loss_weighted(x, t)), rel=1e-5
    )


def test_losses_are_differentiable(rng):
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 2), dtype=np.float32))
    target = jnp.asarray(rng.integers(0, 2, (1, 8, 8)))
    for fn in [
        lambda x: losses.focal_tversky_loss(x, target),
        lambda x: losses.ce_weighted(x, target),
        lambda x: losses.xentropy_loss(jax.nn.softmax(x), jax.nn.one_hot(target, 2)),
        lambda x: losses.dice_loss(jax.nn.softmax(x), jax.nn.one_hot(target, 2)),
    ]:
        g = jax.grad(lambda x: fn(x).sum())(logits)
        assert bool(jnp.isfinite(g).all())
