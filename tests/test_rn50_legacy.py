"""StarDist-RN50 and legacy-block tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_stardist_rn50_forward():
    from cellvit_tpu.models.stardist_rn50 import StarDistRN50

    model = StarDistRN50(n_rays=8, n_seg_cls=6)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["dist_map"].shape == (1, 64, 64, 1)
    assert out["stardist_map"].shape == (1, 64, 64, 8)
    assert float(out["stardist_map"].min()) >= 0.0
    assert out["nuclei_type_map"].shape == (1, 64, 64, 6)


def test_resnet50_encoder_strides():
    from cellvit_tpu.models.stardist_rn50 import ResNet50Encoder

    enc = ResNet50Encoder()
    x = jnp.zeros((1, 64, 64, 3))
    v = enc.init(jax.random.PRNGKey(0), x, train=False)
    f1, f2, f3, f4 = enc.apply(v, x, train=False)
    # stem maxpool disabled (reference quirk): strides 2/4/8/16
    assert f1.shape == (1, 32, 32, 256)
    assert f2.shape == (1, 16, 16, 512)
    assert f3.shape == (1, 8, 8, 1024)
    assert f4.shape == (1, 4, 4, 2048)


def test_mil_attention_blocks(rng):
    from cellvit_tpu.models.legacy_blocks import MILAttention, MILAttentionGated

    h = jnp.asarray(rng.standard_normal((10, 32), dtype=np.float32))
    att = MILAttention(in_features=32, attention_features=16)
    v = att.init(jax.random.PRNGKey(0), h)
    pooled, weights = att.apply(v, h)
    assert pooled.shape == (1, 32)
    np.testing.assert_allclose(np.asarray(weights).sum(), 1.0, rtol=1e-5)

    gated = MILAttentionGated(in_features=32, attention_features=16)
    v2 = gated.init(jax.random.PRNGKey(0), h)
    pooled2, weights2 = gated.apply(v2, h)
    assert pooled2.shape == (1, 32)


def test_dense_and_residual_blocks():
    from cellvit_tpu.models.legacy_blocks import DenseBlock, ResidualBlock

    x = jnp.zeros((1, 32, 32, 16))
    dense = DenseBlock(unit_ksize=(1, 5), unit_ch=(32, 8), unit_count=2)
    v = dense.init(jax.random.PRNGKey(0), x, train=False)
    y = dense.apply(v, x, train=False)
    assert y.shape[-1] == 16 + 2 * 8  # concat growth

    res = ResidualBlock(unit_ksize=(1, 3, 1), unit_ch=(8, 8, 32), unit_count=2)
    v2 = res.init(jax.random.PRNGKey(0), x, train=False)
    y2 = res.apply(v2, x, train=False)
    assert y2.shape == (1, 32, 32, 32)

    res_s2 = ResidualBlock(
        unit_ksize=(1, 3, 1), unit_ch=(8, 8, 32), unit_count=1, stride=2
    )
    v3 = res_s2.init(jax.random.PRNGKey(0), x, train=False)
    y3 = res_s2.apply(v3, x, train=False)
    assert y3.shape == (1, 16, 16, 32)


def test_bilinear_up2_matches_torch_align_corners():
    """_bilinear_up2 vs torch nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True) — the reference RN50 decoder's upsampler."""
    import torch

    from cellvit_tpu.models.stardist_rn50 import _bilinear_up2

    rng = np.random.default_rng(0)
    for h, w in ((4, 4), (7, 5), (16, 16)):
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        want = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                scale_factor=2, mode="bilinear", align_corners=True,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        got = np.asarray(_bilinear_up2(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"{h}x{w}")
