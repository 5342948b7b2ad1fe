"""Flash-attention kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellvit_tpu.ops.attention import flash_attention, flash_attention_relpos


def _reference_attention(q, k, v, bias=None):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    if bias is not None:
        logits = logits + bias
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def test_flash_attention_matches_reference(rng):
    b, n, h, d = 2, 256, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_ragged_n(rng):
    """N = 257 (CLS + 16²): padded keys must not contribute."""
    b, n, h, d = 1, 257, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_relpos_matches_sam_math(rng):
    from cellvit_tpu.models.sam_vit import gather_rel_pos

    b, gh, gw, h, d = 1, 8, 8, 2, 32
    n = gh * gw
    q = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    table_h = jnp.asarray(rng.standard_normal((2 * gh - 1, d), dtype=np.float32))
    table_w = jnp.asarray(rng.standard_normal((2 * gw - 1, d), dtype=np.float32))
    rh = gather_rel_pos(table_h, gh)
    rw = gather_rel_pos(table_w, gw)

    # SAM reference math: bias from q·R terms (image_encoder.py:354-392)
    rq = q.reshape(b, gh, gw, h, d)
    bias_h = jnp.einsum("bijnd,ikd->bnijk", rq, rh)
    bias_w = jnp.einsum("bijnd,jld->bnijl", rq, rw)
    bias = (
        bias_h[..., :, None] + bias_w[..., None, :]
    ).reshape(b, h, n, n)
    ref = _reference_attention(q, k, v, bias=bias)

    out = flash_attention_relpos(
        q, k, v, rh, rw, grid_hw=(gh, gw), block_q=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
