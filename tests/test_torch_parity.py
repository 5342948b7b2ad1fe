"""Numeric parity of our primitives vs torch ops (checkpoint compatibility).

These tests validate the weight-layout transforms in checkpoint_io by
comparing our layers against torch's with converted weights — torch here is
an independent oracle library, not the reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cellvit_tpu.models.layers import (
    ConvTranspose2x2,
    LayerNorm2d,
    PatchEmbed,
    resize_matrix_1d,
)


def test_conv_transpose_2x2_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 8), dtype=np.float32)
    w_torch = rng.standard_normal((8, 3, 2, 2), dtype=np.float32)  # (I, O, 2, 2)
    b = rng.standard_normal(3, dtype=np.float32)

    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w_torch),
        torch.from_numpy(b),
        stride=2,
    ).numpy().transpose(0, 2, 3, 1)

    layer = ConvTranspose2x2(3)
    params = {
        "params": {
            "kernel": jnp.asarray(w_torch.transpose(0, 2, 3, 1)),
            "bias": jnp.asarray(b),
        }
    }
    out = layer.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_conv_same_padding_matches_torch(rng):
    from flax import linen as nn

    x = rng.standard_normal((1, 9, 9, 4), dtype=np.float32)
    w = rng.standard_normal((6, 4, 3, 3), dtype=np.float32)  # (O, I, kh, kw)
    b = rng.standard_normal(6, dtype=np.float32)
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    layer = nn.Conv(6, (3, 3), padding="SAME")
    params = {
        "params": {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    }
    out = layer.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_patch_embed_matches_torch_conv16(rng):
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    w = rng.standard_normal((24, 3, 16, 16), dtype=np.float32)
    b = rng.standard_normal(24, dtype=np.float32)
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=16,
    ).numpy().transpose(0, 2, 3, 1)
    layer = PatchEmbed(24, 16)
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, 24)  # checkpoint_io _t_patch
    params = {"params": {"proj": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}}}
    out = layer.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_batchnorm_eval_matches_torch(rng):
    from flax import linen as nn

    x = rng.standard_normal((2, 4, 4, 5), dtype=np.float32)
    gamma = rng.standard_normal(5, dtype=np.float32)
    beta = rng.standard_normal(5, dtype=np.float32)
    mean = rng.standard_normal(5, dtype=np.float32)
    var = rng.uniform(0.5, 2.0, 5).astype(np.float32)
    ref = F.batch_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(mean),
        torch.from_numpy(var),
        torch.from_numpy(gamma),
        torch.from_numpy(beta),
        training=False,
        eps=1e-5,
    ).numpy().transpose(0, 2, 3, 1)
    layer = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9)
    variables = {
        "params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    out = layer.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_gelu_exact_matches_torch(rng):
    x = rng.standard_normal(1000, dtype=np.float32) * 3
    ref = F.gelu(torch.from_numpy(x)).numpy()
    out = jax.nn.gelu(jnp.asarray(x), approximate=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_layernorm2d_matches_torch_formula(rng):
    x = rng.standard_normal((1, 3, 3, 8), dtype=np.float32)
    gamma = rng.standard_normal(8, dtype=np.float32)
    beta = rng.standard_normal(8, dtype=np.float32)
    # SAM LayerNorm2d: per-pixel channel mean/var (biased), eps 1e-6
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    ref = (xt - u) / torch.sqrt(s + 1e-6)
    ref = (torch.from_numpy(gamma)[None, :, None, None] * ref
           + torch.from_numpy(beta)[None, :, None, None])
    ref = ref.numpy().transpose(0, 2, 3, 1)
    layer = LayerNorm2d()
    params = {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    out = layer.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_in,n_out,scale", [(14, 16, (16 + 0.1) / 14), (14, 32, (32 + 0.1) / 14)])
def test_bicubic_resize_matrix_matches_torch(rng, n_in, n_out, scale):
    x = rng.standard_normal((1, 4, n_in, n_in), dtype=np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), scale_factor=(scale, scale), mode="bicubic"
    ).numpy()
    assert ref.shape[-1] == n_out
    m = np.asarray(resize_matrix_1d(n_in, n_out, scale, "bicubic"))
    out = np.einsum("Hg,bcgh,Wh->bcHW", m, x, m)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_linear_resize_matrix_matches_torch(rng):
    x = rng.standard_normal((1, 4, 127), dtype=np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=31, mode="linear").numpy()
    m = np.asarray(resize_matrix_1d(127, 31, 31 / 127, "linear"))
    out = np.einsum("Oi,bci->bcO", m, x)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_attention_matches_torch_reference_math(rng):
    """Our fused-qkv attention vs explicit torch einsum math (timm ViT)."""
    from cellvit_tpu.models.vit import Attention

    b, n, c, h = 2, 7, 16, 4
    x = rng.standard_normal((b, n, c), dtype=np.float32)
    wqkv = rng.standard_normal((3 * c, c), dtype=np.float32)
    bqkv = rng.standard_normal(3 * c, dtype=np.float32)
    wproj = rng.standard_normal((c, c), dtype=np.float32)
    bproj = rng.standard_normal(c, dtype=np.float32)

    xt = torch.from_numpy(x)
    qkv = F.linear(xt, torch.from_numpy(wqkv), torch.from_numpy(bqkv))
    qkv = qkv.reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
    attn = attn.softmax(dim=-1)
    ref = (attn @ v).transpose(1, 2).reshape(b, n, c)
    ref = F.linear(ref, torch.from_numpy(wproj), torch.from_numpy(bproj)).numpy()

    layer = Attention(c, h)
    params = {
        "params": {
            "qkv": {"kernel": jnp.asarray(wqkv.T), "bias": jnp.asarray(bqkv)},
            "proj": {"kernel": jnp.asarray(wproj.T), "bias": jnp.asarray(bproj)},
        }
    }
    out = layer.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
