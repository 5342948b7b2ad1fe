"""Flash attention (Pallas, TPU) with optional decomposed rel-pos bias.

The 4096-token attentions (SAM global blocks at 1024² tiles,
`image_encoder.py:24-125`; ViT-256 at 1024² WSI tiles) materialize
O(N²·heads) logits in XLA — ~1.6 GB per layer per 4-batch at 1024² — and
become HBM-bound. This kernel computes attention with the online-softmax
tiling (never materializing logits) and folds in SAM's decomposed relative
position bias (`add_decomposed_rel_pos`, image_encoder.py:354-392):

    bias[q, k] = Bh[q, ki(k)] + Bw[q, kj(k)],
    Bh[q, i] = Σ_d q_d · RelH[qi(q), i, d]   (precomputed outside, small)

With the key-block size equal to the token-grid width W, ki is constant
per key block and kj = 0..W-1 — the bias tile is a broadcast add, no
gathers inside the kernel.

Numerics: f32 accumulation and softmax state; matmuls take the input dtype
(bf16 in our encoders).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, n_real: int
):
    """Single (batch·head, q-block) program; loops over key blocks."""
    q = q_ref[0].astype(jnp.float32) * scale  # (TQ, D)
    tq, d = q.shape
    n_kblocks = k_ref.shape[1] // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        k_idx = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (tq, block_k), 1
        )
        logits = jnp.where(k_idx < n_real, logits, NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((tq, d), jnp.float32)
    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_kblocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_relpos(
    q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *, scale: float, grid_w: int
):
    """Rel-pos variant: key blocks = one token-grid row (width W)."""
    q = q_ref[0].astype(jnp.float32)  # (TQ, D)
    tq, d = q.shape
    n_kblocks = k_ref.shape[1] // grid_w
    bh = bh_ref[0].astype(jnp.float32)  # (TQ, Hk)
    bw = bw_ref[0].astype(jnp.float32)  # (TQ, W)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * grid_w, grid_w), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * grid_w, grid_w), :].astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        # key block i covers grid row i: bias = Bh[:, i] ⊕ Bw
        logits = logits + bh[:, i][:, None] + bw
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((tq, d), jnp.float32)
    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_kblocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad), n


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q·kᵀ/√d)·v over (B, N, H, D) without materializing logits.

    N may be ragged (e.g. 4097 = CLS + 64²); it is zero-padded to the block
    size and padded keys are masked.
    """
    b, n, h, d = q.shape
    scale = d**-0.5

    def reshape(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = reshape(q), reshape(k), reshape(v)
    qf, _ = _pad_to(qf, 1, block_q)
    kf, n_real = _pad_to(kf, 1, block_k)
    vf, _ = _pad_to(vf, 1, block_k)
    n_q = qf.shape[1]

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, n_real=n_real
        ),
        grid=(b * h, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, kf.shape[1], d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, kf.shape[1], d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_q, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:, :n, :].reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.jit, static_argnames=("grid_hw", "block_q", "interpret"))
def flash_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    grid_hw: Tuple[int, int],
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAM global attention with decomposed rel-pos bias.

    Args:
        q/k/v: (B, N, H, D) with N = grid_h · grid_w tokens in row-major
            grid order.
        rel_pos_h/w: interpolated tables (2·side-1, D) — pass through
            `cellvit_tpu.models.sam_vit.gather_rel_pos` upstream; here they
            arrive as the gathered (side, side, D) form.
    """
    gh, gw = grid_hw
    b, n, h, d = q.shape
    assert n == gh * gw
    scale = d**-0.5

    # Bh[b,h,q,i] = Σ_d q·RelH[qi(q), i, d];  Bw[b,h,q,j] similarly
    rq = q.reshape(b, gh, gw, h, d)
    bh = jnp.einsum("bijnd,ikd->bnijk", rq.astype(jnp.float32),
                    rel_pos_h.astype(jnp.float32))
    bw = jnp.einsum("bijnd,jld->bnijl", rq.astype(jnp.float32),
                    rel_pos_w.astype(jnp.float32))
    bh = bh.reshape(b * h, n, gh)
    bw = bw.reshape(b * h, n, gw)

    def reshape(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    qf, kf, vf = reshape(q), reshape(k), reshape(v)
    assert n % block_q == 0, "grid tokens must tile block_q"

    out = pl.pallas_call(
        functools.partial(_flash_kernel_relpos, scale=scale, grid_w=gw),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, gh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, gw), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bh, bw)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
