"""Flash attention (Pallas, TPU) with optional decomposed rel-pos bias.

The 4096-token attentions (SAM global blocks at 1024² tiles,
`image_encoder.py:24-125`; ViT-256 at 1024² WSI tiles) materialize
O(N²·heads) logits in XLA — ~1.6 GB per layer per 4-batch at 1024² — and
become HBM-bound. This kernel computes attention with the online-softmax
tiling (never materializing logits). SAM's decomposed relative position
bias (`add_decomposed_rel_pos`, image_encoder.py:354-392) is folded into
the q·kᵀ matmul itself by lane augmentation (`flash_attention_relpos`),
so the same kernel serves both the plain and the rel-pos path.

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
LOG2E = 1.4426950408889634  # softmax runs base-2: fold log2(e) into the
LN2 = 0.6931471805599453    # q prescale, exp→exp2 (measured 6.00→5.87 ms
                            # at 8×6×4097×64), un-scale dq/dk by ln 2


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, scale: float, block_k: int, n_real: int, exp2: bool = False
):
    """Single (batch·head, q-block) program; loops over key blocks.
    Also emits the log-sum-exp per query row (backward residual).

    Matmul inputs stay in the storage dtype (bf16) with fp32 accumulation —
    the MXU's native mode; upcasting inputs to fp32 would run the systolic
    array at a fraction of peak (measured 19→70+ TF/s on v5e).

    q/k may be wider than v (rel-pos augmentation, see
    `flash_attention_relpos`): the output takes v's width."""
    q = q_ref[0]  # (TQ, DQK)
    tq = q.shape[0]
    dv = v_ref.shape[-1]
    n_kblocks = k_ref.shape[1] // block_k
    # the kernel is VPU-bound on the softmax, not MXU-bound on the dots
    # (measured 9.25 ms vs a 1.05 ms matmul roofline at 8×6×4097×64), so
    # every per-logit-element VPU op counts:
    # * mask only the blocks that actually contain padded keys;
    # * `scale` (and log2e for the base-2 softmax) is folded into q by the
    #   callers — the per-element multiply is skipped when scale == 1;
    # * the exp runs in the storage dtype (bf16 inputs → bf16 exp: 2×
    #   vector throughput; ~4e-3 relative error, below the bf16 output
    #   quantization. fp32 inputs keep an fp32 exp). m/l stay fp32 —
    #   running the max/sub chain in bf16 was measured SLOWER (8.05 vs
    #   7.80 ms: the casts cost more than the packing saves).
    exp_dtype = q.dtype
    n_full = n_real // block_k  # static: blocks with no padded keys
    # exp2=True: the caller pre-scaled q by log2(e), so logits live in
    # base-2 space and exp/log become exp2/log2 — softmax is invariant,
    # the lse residual is stored base-2 (the backward kernels match)
    ex = jnp.exp2 if exp2 else jnp.exp
    lg = jnp.log2 if exp2 else jnp.log

    def make_body(mask: bool):
        def body(i, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            if scale != 1.0:
                logits = logits * scale
            if mask:
                k_idx = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (tq, block_k), 1
                )
                logits = jnp.where(k_idx < n_real, logits, NEG_INF)
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = ex((logits - m_new).astype(exp_dtype))
            alpha = ex(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(
                p, axis=-1, keepdims=True, dtype=jnp.float32
            )
            acc = acc * alpha + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return acc, m_new, l_new

        return body

    acc0 = jnp.zeros((tq, dv), jnp.float32)
    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    carry = jax.lax.fori_loop(0, n_full, make_body(False), (acc0, m0, l0))
    acc, m, l = jax.lax.fori_loop(
        n_full, n_kblocks, make_body(True), carry
    )
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0] = m + lg(jnp.maximum(l, 1e-30))


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale: float, block_k: int, n_real: int, exp2: bool = False,
):
    """dq for one q block: dq = Σ_k (p ∘ (do·vᵀ − Δ)) · k · scale.
    Matmuls run on bf16 inputs with fp32 accumulation (MXU-native)."""
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    tq, d = q.shape
    n_kblocks = k_ref.shape[1] // block_k

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if scale != 1.0:
            logits = logits * scale
        k_idx = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (tq, block_k), 1
        )
        logits = jnp.where(k_idx < n_real, logits, NEG_INF)
        p = (jnp.exp2 if exp2 else jnp.exp)(logits - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if scale != 1.0:
            ds = ds * scale
        ds = ds.astype(k.dtype)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, n_kblocks, body, jnp.zeros((tq, d), jnp.float32))
    if exp2:  # d(2^x)/dx = ln2·2^x — one multiply per dq element, not per logit
        dq = dq * LN2
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale: float, block_q: int, n_real: int, exp2: bool = False,
):
    """dk/dv for one k block: dv = Σ_q pᵀ·do; dk = Σ_q dsᵀ·q·scale.
    Padded queries carry do = 0 and Δ = 0, so they contribute nothing.
    Matmuls run on bf16 inputs with fp32 accumulation (MXU-native)."""
    k = k_ref[0]  # (TK, DQK)
    v = v_ref[0]  # (TK, DV)
    tk, d = k.shape
    dv_w = v.shape[-1]
    n_qblocks = q_ref.shape[1] // block_q
    j = pl.program_id(1)
    k_idx = j * tk + jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
    k_valid = k_idx < n_real  # (1, TK)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if scale != 1.0:
            logits = logits * scale
        logits = jnp.where(k_valid, logits, NEG_INF)
        p = (jnp.exp2 if exp2 else jnp.exp)(logits - lse)
        pt = p.astype(do.dtype).T
        dv = dv + jnp.dot(pt, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if scale != 1.0:
            ds = ds * scale
        ds = ds.astype(q.dtype)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, n_qblocks, body,
        (jnp.zeros((tk, d), jnp.float32), jnp.zeros((tk, dv_w), jnp.float32)),
    )
    if exp2:  # ln2 from d(2^x)/dx; dv carries no derivative of p's argument
        dk = dk * LN2
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_relpos_kernel(
    q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref,
    *, block_k: int, gw: int, n_real: int,
):
    """Flash forward with the decomposed rel-pos bias added IN VMEM.

    The lane-augmentation route (`flash_attention_relpos`) widens the q·kᵀ
    contraction from head_dim to head_dim + grid_h + grid_w (64 → 192 for
    SAM's 64×64 global grids, 80 → 208→256 padded for SAM-H): the MXU then
    spends 2-3× the FLOPs of the real d-wide dot just to add the bias.
    Here the dot stays d-wide and the bias lands as VPU adds on the logits
    tile: for a key block of `rows = block_k // gw` grid rows,

        bias[q, r·gw + j] = Bh[q, r0 + r] + Bw[q, j]

    is built from lane-broadcasts of Bh columns plus a gw-periodic tile of
    Bw (`image_encoder.py:354-392` semantics, exact). The key loop is
    statically unrolled so the Bh column slices stay static (Mosaic has no
    dynamic lane slicing). Softmax runs base-2: the caller pre-scales q
    AND Bh/Bw by log2(e). Online-softmax state matches `_flash_kernel`."""
    q = q_ref[0]  # (TQ, D)
    tq = q.shape[0]
    dv = v_ref.shape[-1]
    bw_cols = bw_ref[0].astype(jnp.float32)  # (TQ, gw)
    rows = block_k // gw
    bw_tile = jnp.concatenate([bw_cols] * rows, axis=-1)  # (TQ, block_k)
    n_kblocks = k_ref.shape[1] // block_k
    exp_dtype = q.dtype

    acc = jnp.zeros((tq, dv), jnp.float32)
    m_prev = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l_prev = jnp.zeros((tq, 1), jnp.float32)
    for kb in range(n_kblocks):  # static unroll: static Bh lane slices
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        r0 = kb * rows
        bh_built = jnp.concatenate(
            [
                jnp.broadcast_to(
                    bh_ref[0, :, r0 + r : r0 + r + 1].astype(jnp.float32),
                    (tq, gw),
                )
                for r in range(rows)
            ],
            axis=-1,
        )
        logits = logits + (bh_built + bw_tile)
        if (kb + 1) * block_k > n_real:
            k_idx = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (tq, block_k), 1
            )
            logits = jnp.where(k_idx < n_real, logits, NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2((logits - m_new).astype(exp_dtype))
        alpha = jnp.exp2(m_prev - m_new)
        l_prev = l_prev * alpha + jnp.sum(
            p, axis=-1, keepdims=True, dtype=jnp.float32
        )
        acc = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_prev = m_new
    o_ref[0] = (acc / jnp.maximum(l_prev, 1e-30)).astype(o_ref.dtype)


def _win_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_real: int,
                     exp2: bool = False):
    """Whole-window attention for a batch of WB (window·head) pairs.

    SAM's windowed blocks attend within 196-token windows
    (`image_encoder.py:181-188`): the whole (196, 196) logits tile fits in
    VMEM, so no online softmax is needed — one pass, logits never touch
    HBM. Batching WB pairs per program amortizes grid/DMA overhead that
    made the plain flash kernel (grid = windows·heads = 2400 single-block
    programs at 8×1024²) recover only ~2 of the ~6.7 ms the XLA einsum
    path spent on logits HBM traffic per SAM-B block. Measured SAM-B
    windowed block: einsum 13.94 → flash route 12.06 → this kernel
    11.54 ms (SAM-H: 24.5 → 21.4 → 21.11); a (H, NW, N, D)-blocked
    variant paid an extra head-major relayout and lost (13.52/22.57).

    Matmuls in the storage dtype with fp32 accumulation; exp in the
    storage dtype (house numerics, see `_flash_kernel`)."""
    wb = q_ref.shape[0]
    n_pad = q_ref.shape[1]
    # exp2=True: the caller pre-scaled q by log2(e) (softmax is invariant
    # under the base change; exp2 is the cheaper VPU op — see _flash_kernel)
    ex = jnp.exp2 if exp2 else jnp.exp
    for w in range(wb):  # static unroll over the (window·head) batch
        q = q_ref[w]  # (Np, DQK)
        k = k_ref[w]
        v = v_ref[w]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if n_pad != n_real:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < n_real, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = ex((logits - m).astype(q.dtype))
        l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[w] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _win_core(q, k, v, window_block, interpret, exp2=False, layout="bnhd"):
    return _win_fwd(q, k, v, window_block, interpret, exp2, layout)


def _win_fwd(q, k, v, window_block, interpret, exp2=False, layout="bnhd"):
    """Per-window attention via the VMEM-resident kernel.
    Folds (window, head) into one flat batch axis (the same transpose the
    flash route pays — a head-major (H, NW, N, D) blocking measured ~2 ms
    slower per SAM-B block), pads N to the sublane multiple and the flat
    batch to the window block. With layout="bhnd" the inputs are already
    head-major (B, H, N, D) and the flatten is a free reshape — the SAM
    windowed path pays ONE packed qkv transpose instead of three per-tensor
    relayouts here (round-4 HLO profile: the prep copies were ~4 ms of a
    19 ms SAM-H block)."""
    if layout == "bhnd":
        b, h, n, d = q.shape
    else:
        b, n, h, d = q.shape
    dv = v.shape[-1]
    sub = 8 if q.dtype == jnp.float32 else 16
    n_pad = -(-n // sub) * sub
    bh = b * h
    wb = min(window_block, bh)
    bh_pad = -(-bh // wb) * wb

    def prep(x):
        if layout == "bhnd":
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
            x = x.reshape(bh, n_pad, x.shape[-1])
        else:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
            x = x.transpose(0, 2, 1, 3).reshape(bh, n_pad, x.shape[-1])
        if bh_pad != bh:
            x = jnp.pad(x, ((0, bh_pad - bh), (0, 0), (0, 0)))
        return x

    qf, kf, vf = prep(q), prep(k), prep(v)
    out = pl.pallas_call(
        functools.partial(_win_attn_kernel, n_real=n, exp2=exp2),
        grid=(bh_pad // wb,),
        in_specs=[
            pl.BlockSpec((wb, n_pad, d), lambda j: (j, 0, 0)),
            pl.BlockSpec((wb, n_pad, d), lambda j: (j, 0, 0)),
            pl.BlockSpec((wb, n_pad, dv), lambda j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((wb, n_pad, dv), lambda j: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh_pad, n_pad, dv), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:bh].reshape(b, h, n_pad, dv)[:, :, :n]
    # output is token-major (B, N, H, D) in both layouts: the projection
    # consumes (B, N, H·D), so this transpose is paid either way
    return out.transpose(0, 2, 1, 3)


def _win_core_fwd(q, k, v, window_block, interpret, exp2=False,
                  layout="bnhd"):
    return _win_fwd(q, k, v, window_block, interpret, exp2, layout), (q, k, v)


def _win_core_bwd(window_block, interpret, exp2, layout, res, do):
    """Backward by exact recompute in XLA (fp32 softmax): windows are
    tiny in every training regime (256² crops → 4 windows/image), so
    materializing (B, H, N, N) logits only in the backward is cheap.

    With exp2 the caller pre-scaled q by log2(e), so the function computed
    inside this boundary is softmax(q·kᵀ·ln2)·v — the recompute and the
    dq/dk products carry the ln2 factor (the outer ×log2e is chain-ruled
    by XLA outside the boundary)."""
    q, k, v = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)  # token-major (B, N, H, D) in both layouts
    if layout == "bhnd":
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
        if exp2:
            logits = logits * LN2
        p = jax.nn.softmax(logits, axis=-1)
        dv = jnp.einsum("bhqk,bqhd->bhkd", p, dof)
        dp = jnp.einsum("bqhd,bhkd->bhqk", dof, vf)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        if exp2:
            ds = ds * LN2
        dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf).astype(q.dtype)
        dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf).astype(k.dtype)
        return dq, dk, dv.astype(v.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    if exp2:
        logits = logits * LN2
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, dof)
    dp = jnp.einsum("bqhd,bkhd->bhqk", dof, vf)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    if exp2:
        ds = ds * LN2
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf).astype(q.dtype)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf).astype(k.dtype)
    return dq, dk, dv.astype(v.dtype)


_win_core.defvjp(_win_core_fwd, _win_core_bwd)


@functools.partial(
    jax.jit, static_argnames=("window_block", "interpret", "exp2", "layout")
)
def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_block: int = 8,
    interpret: bool = False,
    exp2: bool = False,
    layout: str = "bnhd",
) -> jnp.ndarray:
    """Softmax(q·kᵀ)·v independently per batch element (= per window),
    for short sequences (N ≲ 256) whose logits tile fits in VMEM.

    The batch dim is the window axis (e.g. B·25 windows of 196 tokens for
    SAM's 14×14 windowed attention at 1024² tiles). No scale is applied —
    fold it into q (the rel-pos lane augmentation already requires
    scale=1). With exp2=True the caller has ALSO folded log2(e) into q and
    the kernel runs the softmax base-2. layout="bhnd" takes head-major
    inputs (flattening becomes a free reshape); the output is token-major
    (B, N, H, D) in both layouts. q/k may be wider than v; the output
    takes v's width. Differentiable: backward recomputes exactly in XLA."""
    return _win_core(q, k, v, window_block, interpret, exp2, layout)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad), n


def _flash_fwd_call(qf, kf, vf, block_q, block_k, n_real, scale, interpret,
                    exp2=False):
    bh, n_q, d = qf.shape
    dv = vf.shape[-1]
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, n_real=n_real,
            exp2=exp2,
        ),
        grid=(bh, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, kf.shape[1], d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, kf.shape[1], dv), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_q, dv), qf.dtype),
            jax.ShapeDtypeStruct((bh, n_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_core(qf, kf, vf, block_q, block_k, n_real, scale, interpret,
                exp2=False, bwd_block_k=None):
    out, _ = _flash_fwd_call(qf, kf, vf, block_q, block_k, n_real, scale,
                             interpret, exp2)
    return out


def _flash_core_fwd(qf, kf, vf, block_q, block_k, n_real, scale, interpret,
                    exp2=False, bwd_block_k=None):
    out, lse = _flash_fwd_call(qf, kf, vf, block_q, block_k, n_real, scale,
                               interpret, exp2)
    return out, (qf, kf, vf, out, lse)


def _flash_core_bwd(block_q, block_k, n_real, scale, interpret, exp2,
                    bwd_block_k, res, do):
    """Standard flash backward: recompute p per tile from (q, k, lse);
    Δ = rowsum(do ∘ o); ds = p ∘ (do·vᵀ − Δ)·scale; dq/dk/dv via two
    kernels (one writes q blocks, one writes k blocks)."""
    qf, kf, vf, out, lse = res
    bh, n_q, d = qf.shape
    n_k = kf.shape[1]
    dv_w = vf.shape[-1]
    # the forward may run one whole-K block (ragged-N tuning); the backward
    # chunks K at bwd_block_k so its logits tiles stay lane-aligned
    bwd_bk = bwd_block_k or block_k
    do = do.astype(qf.dtype)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, block_k=bwd_bk, n_real=n_real,
            exp2=exp2,
        ),
        grid=(bh, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_k, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_k, dv_w), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, dv_w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), qf.dtype),
        interpret=interpret,
    )(qf, kf, vf, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, block_q=block_q,
            n_real=n_real, exp2=exp2,
        ),
        grid=(bh, n_k // bwd_bk),
        in_specs=[
            pl.BlockSpec((1, n_q, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bwd_bk, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bwd_bk, dv_w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_q, dv_w), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_q, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_q, 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bwd_bk, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bwd_bk, dv_w), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_k, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, n_k, dv_w), vf.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, do, lse, delta)
    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _pick_blocks(n: int, fp32: bool) -> Tuple[int, int, int]:
    """(block_q, block_k, bwd_block_k) for a sequence length.

    512-divisible N (SAM global grids: 4096) tiles perfectly at 512.
    Ragged N (4097 = CLS + 64² in the histo ViT at 1024²) wastes 26% of
    the logit work on 512 blocks (9×9 tiles on padded 4608): a 528-row
    q-block (sublanes allow any ×16) with ONE whole-K block (lanes need
    ×128; a 384-multiple also serves the backward chunking) cuts the waste
    to ~6% and runs the online-softmax rescale once instead of 9 times —
    measured 6.08 → 5.19 ms at (48, 4097, 64) on v5e. The backward keeps
    384-wide K chunks so its logits tiles stay lane-aligned."""
    if fp32:  # parity path: smaller tiles bound the fp32 VMEM staging
        if n % 256 == 0:
            return 256, 256, 256
        return 256, (-(-n // 384) * 384 if n <= 4224 else 384), 384
    if n % 512 == 0:
        return 512, 512, 512
    return 528, (-(-n // 384) * 384 if n <= 4224 else 384), 384


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "scale", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q·kᵀ·scale)·v over (B, N, H, D) without materializing logits.

    N may be ragged (e.g. 4097 = CLS + 64²); it is zero-padded to the block
    size and padded keys are masked. Block shapes default to the N-adaptive
    `_pick_blocks` tuning. Differentiable: a custom VJP runs the flash
    backward in Pallas (never materializing logits either), so the kernel
    is usable in 1024² training.

    `scale` defaults to q.shape[-1]**-0.5. q/k may be wider than v
    (`flash_attention_relpos` folds the rel-pos bias into extra q/k lanes
    with scale=1); the output takes v's width.
    """
    b, n, h, d = q.shape
    dv = v.shape[-1]
    if scale is None:
        scale = d**-0.5
    auto_bq, auto_bk, bwd_bk = _pick_blocks(n, q.dtype == jnp.float32)
    block_q = block_q or auto_bq
    block_k = block_k or auto_bk
    if block_k != auto_bk:
        bwd_bk = block_k  # explicit blocks: backward mirrors them

    def reshape(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], x.shape[-1])

    # fold the scale into q OUTSIDE the kernel: one multiply per q element
    # instead of one per logit element (N² per call — ~0.8 ms of pure VPU
    # time at 8×6×4097). log2(e) is folded in with it: the kernels run the
    # softmax in base 2 (exp2 is the cheaper VPU op — measured 6.00 → 5.87
    # ms; Δ vs the exp kernel ≤ 2e-3 post-softmax in bf16, inside the
    # storage quantization). The custom-VJP boundary sees the scaled q;
    # XLA chain-rules the outer multiply into dq automatically, and the
    # kernels account for the ln2 factor of d(2^x)/dx.
    qf = reshape(q) * jnp.asarray(scale * LOG2E, q.dtype)
    kf, vf = reshape(k), reshape(v)
    qf, _ = _pad_to(qf, 1, block_q)
    kf, n_real = _pad_to(kf, 1, block_k)
    vf, _ = _pad_to(vf, 1, block_k)

    out = _flash_core(qf, kf, vf, block_q, block_k, n_real, 1.0, interpret,
                      True, bwd_bk)
    return out[:, :n, :].reshape(b, h, n, dv).transpose(0, 2, 1, 3)


def _relpos_aug(q, k, bh, bw, grid_hw, layout="bnhd"):
    """Augmented-lane (q', k') tensors for the decomposed rel-pos bias —
    shared by the fallback forward and the direct-bias kernel's backward.
    `layout`: "bnhd" (token-major) or "bhnd" (head-major, the SAM windowed
    fast path — no transpose needed before the flat (B·H, N, D) kernel)."""
    gh, gw = grid_hw
    d = q.shape[-1]
    n = gh * gw
    scale = d**-0.5
    ii = jnp.arange(n, dtype=jnp.int32) // gw
    jj = jnp.arange(n, dtype=jnp.int32) % gw
    onehot = jnp.concatenate(
        [jax.nn.one_hot(ii, gh, dtype=k.dtype),
         jax.nn.one_hot(jj, gw, dtype=k.dtype)], axis=-1
    )  # (N, gh+gw)
    if layout == "bnhd":
        oh = onehot[None, :, None, :]
    else:  # bhnd: N is axis 2
        oh = onehot[None, None, :, :]
    q_aug = jnp.concatenate([q * scale, bh, bw], axis=-1)
    k_aug = jnp.concatenate(
        [k, jnp.broadcast_to(oh, k.shape[:-1] + (gh + gw,))], axis=-1
    )
    return q_aug, k_aug


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _relpos_core(q, k, v, bh, bw, grid_hw, block_q, block_k, interpret,
                 layout="bnhd"):
    return _relpos_fwd_only(q, k, v, bh, bw, grid_hw, block_q, block_k,
                            interpret, layout)


def _relpos_fwd_only(q, k, v, bh, bw, grid_hw, block_q, block_k, interpret,
                     layout="bnhd"):
    """Global rel-pos attention via the direct-bias VMEM kernel: d-wide
    q·kᵀ on the MXU, bias as VPU adds on the logits tile (vs 2-3× the dot
    FLOPs on the lane-augmented path). layout="bhnd" takes head-major
    inputs whose flattening is a free reshape."""
    gh, gw = grid_hw
    if layout == "bhnd":
        b, h, n, d = q.shape
    else:
        b, n, h, d = q.shape
    dv = v.shape[-1]
    scale = d**-0.5

    def reshape(x):
        if layout == "bhnd":
            return x.reshape(b * h, n, x.shape[-1])
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, x.shape[-1])

    qf = reshape(q) * jnp.asarray(scale * LOG2E, q.dtype)
    kf, vf = reshape(k), reshape(v)
    l2e = jnp.asarray(LOG2E, bh.dtype)
    bhf, bwf = reshape(bh * l2e), reshape(bw * l2e)
    out = pl.pallas_call(
        functools.partial(
            _flash_relpos_kernel, block_k=block_k, gw=gw, n_real=n
        ),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, dv), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, gh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, gw), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dv), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bhf, bwf)
    return out.reshape(b, h, n, dv).transpose(0, 2, 1, 3)


def _relpos_core_fwd(q, k, v, bh, bw, grid_hw, block_q, block_k, interpret,
                     layout="bnhd"):
    out = _relpos_fwd_only(q, k, v, bh, bw, grid_hw, block_q, block_k,
                           interpret, layout)
    return out, (q, k, v, bh, bw)


def _relpos_core_bwd(grid_hw, block_q, block_k, interpret, layout, res, do):
    """Backward through the mathematically-identical augmented-lane path:
    dq'/dk' slices give dq, dk, dBh, dBw (the indicator lanes of k' are
    constants). Global rel-pos attention only occurs at 1024²-tile
    inference in the shipped configs (256² training crops route through
    the window kernel), so the backward optimizes for correctness (the
    head-major layout round-trips through token-major for the flash
    backward)."""
    q, k, v, bh, bw = res
    d = q.shape[-1]
    gh = bh.shape[-1]
    scale = d**-0.5
    if layout == "bhnd":
        tm = lambda x: x.transpose(0, 2, 1, 3)
        q, k, v, bh, bw = tm(q), tm(k), tm(v), tm(bh), tm(bw)
    q_aug, k_aug = _relpos_aug(q, k, bh, bw, grid_hw)
    _, vjp = jax.vjp(
        lambda qa, ka, vv: flash_attention(qa, ka, vv, scale=1.0,
                                           interpret=interpret),
        q_aug, k_aug, v,
    )
    dqa, dka, dv = vjp(do)
    dq = dqa[..., :d] * scale
    dbh = dqa[..., d : d + gh]
    dbw = dqa[..., d + gh :]
    dk = dka[..., :d]
    if layout == "bhnd":
        dq, dk, dv = tm(dq), tm(dk), tm(dv)
        dbh, dbw = tm(dbh), tm(dbw)
    return dq, dk, dv, dbh, dbw


_relpos_core.defvjp(_relpos_core_fwd, _relpos_core_bwd)


@functools.partial(
    jax.jit, static_argnames=("grid_hw", "block_q", "interpret", "layout")
)
def flash_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    grid_hw: Tuple[int, int],
    block_q: Optional[int] = None,
    interpret: bool = False,
    layout: str = "bnhd",
) -> jnp.ndarray:
    """SAM attention with decomposed rel-pos bias
    (`add_decomposed_rel_pos`, image_encoder.py:354-392).

    Three routes, all computing softmax(q·kᵀ·scale + Bh + Bw)·v exactly:

    * N ≤ 256 (14×14 windows, 16×16 training grids): whole-window VMEM
      kernel on lane-augmented q'/k' — q' = [q·scale | Bh(q,·) | Bw(q,·)]
      against k' = [k | 1{ki=·} | 1{kj=·}], so q'·k'ᵀ adds the bias inside
      the matmul. At window size the augmentation is free (d+gh+gw ≤ 128
      lanes, the MXU minimum tile).
    * large divisible grids (SAM 64×64 global at 1024²): direct-bias flash
      kernel (`_flash_relpos_kernel`) — the dot stays d-wide and Bh/Bw land
      as VPU adds on the logits tile. The augmented dot at this size costs
      192/64 = 3× (SAM-B) to 256/128 = 2× (SAM-H) the real-dot MXU work.
    * ragged grids: augmented-lane flash fallback.

    Differentiable end-to-end: the direct-bias core's VJP routes through
    the augmented formulation (dq'/dk' slices give dq/dk/dBh/dBw), and
    autodiff carries Bh/Bw back through the einsums into q and the tables.

    Args:
        q/k/v: (B, N, H, D) — or (B, H, N, D) with layout="bhnd" — with
            N = grid_h · grid_w tokens in row-major grid order. The
            head-major form lets the flat (B·H, N, D) kernel staging be a
            free reshape; the SAM encoder feeds it from ONE packed qkv
            transpose instead of three per-tensor relayouts.
        rel_pos_h/w: gathered tables (side, side, D) from
            `cellvit_tpu.models.sam_vit.gather_rel_pos`.
    Returns: token-major (B, N, H, D) in both layouts.
    """
    gh, gw = grid_hw
    if layout == "bhnd":
        b, h, n, d = q.shape
    else:
        b, n, h, d = q.shape
    assert n == gh * gw

    # Bh[b,q,h,i] = Σ_d q·RelH[qi(q), i, d];  Bw[b,q,h,j] similarly (small).
    # Inputs stay in the storage dtype with fp32 accumulation: the result
    # is quantized to q.dtype anyway, and the fp32-upcast variant
    # materialized a full fp32 copy of q per windowed block.
    if layout == "bhnd":
        rq = q.reshape(b, h, gh, gw, d)
        bh = jnp.einsum("bhijd,ikd->bhijk", rq, rel_pos_h.astype(q.dtype),
                        preferred_element_type=jnp.float32)
        bw = jnp.einsum("bhijd,jld->bhijl", rq, rel_pos_w.astype(q.dtype),
                        preferred_element_type=jnp.float32)
        bh = bh.reshape(b, h, n, gh).astype(q.dtype)
        bw = bw.reshape(b, h, n, gw).astype(q.dtype)
    else:
        rq = q.reshape(b, gh, gw, h, d)
        bh = jnp.einsum("bijnd,ikd->bijnk", rq, rel_pos_h.astype(q.dtype),
                        preferred_element_type=jnp.float32)
        bw = jnp.einsum("bijnd,jld->bijnl", rq, rel_pos_w.astype(q.dtype),
                        preferred_element_type=jnp.float32)
        bh = bh.reshape(b, n, h, gh).astype(q.dtype)
        bw = bw.reshape(b, n, h, gw).astype(q.dtype)

    # short sequences (the 14×14 windows, N=196, windows as batch; or
    # 16×16 global grids at 256² training crops): whole-window VMEM
    # kernel — one (N, N) logits tile per (window·head), WB pairs per
    # program. The flash grid at this shape degenerates to windows·heads
    # single-block programs whose per-program overhead gave back most of
    # the HBM saving (measured SAM-B windowed block: einsum 13.94 →
    # flash 12.06 → window kernel 11.54 ms; SAM-H 24.5 → 21.4 → 21.11).
    # The lane augmentation costs nothing extra here: d + gh + gw ≤ 128
    # for every 14×14 window config, inside the 128-lane minimum tile.
    if n <= 256:
        q_aug, k_aug = _relpos_aug(q, k, bh, bw, (gh, gw), layout)
        # window-batch size: 16 measured best at head_dim 64 (SAM-B
        # 5.24→5.00 ms per block-equivalent), 8 at head_dim 80 (SAM-H
        # 7.29 vs 7.64) — r4 WB sweep at 200 windows × heads, b8×1024²
        wb = 16 if v.shape[-1] <= 64 else 8
        # base-2 softmax: log2(e) folds into q' (XLA fuses the multiply
        # into the concat producer), the kernel runs exp2
        q_aug = q_aug * jnp.asarray(LOG2E, q_aug.dtype)
        return window_attention(q_aug, k_aug, v, window_block=wb,
                                interpret=interpret, exp2=True,
                                layout=layout)

    # large global grids (SAM 64×64 at 1024² tiles): the direct-bias
    # kernel keeps the q·kᵀ contraction d-wide and adds Bh/Bw in VMEM —
    # the lane-augmented dot spent 192/64 = 3× (SAM-B) to 256/80 (SAM-H,
    # padded) the real-dot MXU FLOPs just to apply the bias.
    blk_k = gw * max(1, 512 // gw)
    if n % blk_k == 0 and blk_k % gw == 0 and gh % (blk_k // gw) == 0:
        bq = block_q or (512 if n % 512 == 0 else None)
        if bq is not None and n % bq == 0:
            return _relpos_core(q, k, v, bh, bw, (gh, gw), bq, blk_k,
                                interpret, layout)

    # fallback (ragged grids): augmented-lane flash, N-adaptive blocks
    # (fp32 staging of the 192-lane augmented q/k overflows the 16 MB
    # scoped-VMEM budget at N=4096 with 512-wide blocks — _pick_blocks
    # clamps fp32 q tiles to 256)
    if layout == "bhnd":  # the flash fallback is token-major (rare route)
        tm = lambda x: x.transpose(0, 2, 1, 3)
        q, k, v, bh, bw = tm(q), tm(k), tm(v), tm(bh), tm(bw)
    q_aug, k_aug = _relpos_aug(q, k, bh, bw, (gh, gw))
    bq = min(block_q, n) if block_q is not None else None
    return flash_attention(
        q_aug, k_aug, v, block_q=bq, block_k=bq, scale=1.0,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fused per-window qkv + rel-pos attention (SAM windowed blocks)
# ---------------------------------------------------------------------------


def _win_qkv_kernel(x_ref, w_ref, b_ref, rht_ref, rwt_ref, o_ref,
                    *, hd: int, side: int, scale: float):
    """One window's LN'd tokens → per-head qkv projection → decomposed
    rel-pos attention, entirely in VMEM.

    The separate-ops SAM windowed path pays, per block, an HBM round trip
    for EACH of: the qkv projection output (3C wide), the head-major qkv
    transpose, the Bh/Bw bias einsum outputs, the lane-augmented q'/k'
    concats, and the attention kernel staging. Here the per-head qkv
    matmul runs inside the program (weights resident in VMEM across the
    window loop), so q/k/v/bias/logits never exist in HBM at all —
    `image_encoder.py:208-270` semantics (qkv on the zero-padded window
    grid, bias from the UNSCALED q), exact.

    Per head h (static unroll):
      qkv_h = x @ W_h + b_h                              (fp32 accumulation)
      logits = (q·scale·log2e) @ kᵀ                       (base-2 softmax)
      Ph = (q·log2e) @ RHᵀ   →  Ph[t, i·side+i'] = q_t·rh[i, i']·log2e
      Bh[t, i'] = Ph[t, qi(t)·side + i']   (row-mask select, VPU)
      bias[t, k'] = Bh[t, k'//side] + Bw[t, k'%side]      (one-hot expand
      matmuls — MXU, K=side)
      o_h = softmax2(logits + bias) @ v

    Head outputs concatenate along lanes → (N, HG·hd), the token-major
    layout the proj matmul consumes."""
    x = x_ref[0]  # (N, C) storage dtype
    n = x.shape[0]
    hg = w_ref.shape[0]
    dt = x.dtype
    f32 = jnp.float32

    # expansion one-hots: EH[i', k'] = 1{k'//side == i'}; EW[j', k'] = 1{k'%side == j'}
    kcol = jax.lax.broadcasted_iota(jnp.int32, (side, n), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (side, n), 0)
    eh = (kcol // side == srow).astype(dt)
    ew = (kcol % side == srow).astype(dt)
    ti = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    qi = ti // side  # (N, 1) query grid row
    qj = ti - qi * side  # query grid col

    outs = []
    for h in range(hg):  # static unroll over the head group
        qkv = jnp.dot(x, w_ref[h], preferred_element_type=f32) + b_ref[h]
        q = qkv[:, :hd]  # (N, hd) fp32
        k = qkv[:, hd : 2 * hd].astype(dt)
        v = qkv[:, 2 * hd :].astype(dt)
        qs = (q * (scale * LOG2E)).astype(dt)
        q2 = (q * LOG2E).astype(dt)  # bias uses the UNSCALED q
        logits = jnp.dot(qs, k.T, preferred_element_type=f32)
        ph = jnp.dot(q2, rht_ref[...], preferred_element_type=f32)  # (N, N)
        pw = jnp.dot(q2, rwt_ref[...], preferred_element_type=f32)
        bh = jnp.zeros((n, side), f32)
        bw = jnp.zeros((n, side), f32)
        for i in range(side):  # static row/col-mask selection
            bh += ph[:, i * side : (i + 1) * side] * (qi == i).astype(f32)
            bw += pw[:, i * side : (i + 1) * side] * (qj == i).astype(f32)
        bias = jnp.dot(bh.astype(dt), eh, preferred_element_type=f32)
        bias += jnp.dot(bw.astype(dt), ew, preferred_element_type=f32)
        logits = logits + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2((logits - m).astype(dt))
        l = jnp.sum(p, axis=-1, keepdims=True, dtype=f32)
        o = jnp.dot(p.astype(dt), v, preferred_element_type=f32)
        outs.append((o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _win_qkv_layouts(w, b, rel_pos_h, rel_pos_w, num_heads, dtype):
    """Head-major weight/bias/table layouts the kernel consumes.

    w: (C, 3C) qkv kernel → (nh, C, 3·hd) with per-head [q|k|v] columns;
    b: (3C,) or None → (nh, 1, 3·hd) fp32; rel tables (side, side, hd)
    (from `gather_rel_pos`) → (hd, side²) transposed matmul operands."""
    c = w.shape[0]
    hd = c // num_heads
    w_heads = (
        w.reshape(c, 3, num_heads, hd)
        .transpose(2, 0, 1, 3)
        .reshape(num_heads, c, 3 * hd)
        .astype(dtype)
    )
    if b is None:
        b_heads = jnp.zeros((num_heads, 1, 3 * hd), jnp.float32)
    else:
        b_heads = (
            b.reshape(3, num_heads, hd)
            .transpose(1, 0, 2)
            .reshape(num_heads, 1, 3 * hd)
            .astype(jnp.float32)
        )
    side = rel_pos_h.shape[0]
    rht = rel_pos_h.reshape(side * side, hd).T.astype(dtype)
    rwt = rel_pos_w.reshape(side * side, hd).T.astype(dtype)
    return w_heads, b_heads, rht, rwt


def _win_qkv_ref(x, w, b, rel_pos_h, rel_pos_w, num_heads):
    """Pure-JAX fp32 oracle of the fused window block (same math, no
    base-2 folding): backward recompute + CPU/parity reference."""
    nw, n, c = x.shape
    hd = c // num_heads
    side = rel_pos_h.shape[0]
    scale = hd**-0.5
    xf = x.astype(jnp.float32)
    qkv = jnp.einsum("wnc,cd->wnd", xf, w.astype(jnp.float32))
    if b is not None:
        qkv = qkv + b.astype(jnp.float32)
    qkv = qkv.reshape(nw, n, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (NW, N, H, hd)
    logits = jnp.einsum("wqhd,wkhd->whqk", q * scale, k)
    rq = q.reshape(nw, side, side, num_heads, hd)
    bh = jnp.einsum("wijnd,ikd->wnijk", rq, rel_pos_h.astype(jnp.float32))
    bw = jnp.einsum("wijnd,jld->wnijl", rq, rel_pos_w.astype(jnp.float32))
    bias = (bh[..., :, None] + bw[..., None, :]).reshape(
        nw, num_heads, n, n
    )
    p = jax.nn.softmax(logits + bias, axis=-1)
    out = jnp.einsum("whqk,wkhd->wqhd", p, v)
    return out.reshape(nw, n, c).astype(x.dtype)


def _pick_head_group(num_heads: int, hd: int, c: int) -> int:
    """Largest head group whose output-lane offset stays 128-aligned and
    whose weight block stays ≲5 MB (VMEM double-buffer headroom)."""
    best = num_heads
    for hg in range(num_heads, 0, -1):
        if num_heads % hg:
            continue
        aligned = hg == num_heads or (hg * hd) % 128 == 0
        small = hg * c * 3 * hd * 2 <= 5 * 1024 * 1024
        if aligned and small:
            return hg
        if aligned:
            best = hg
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _win_qkv_core(x, w, b, rel_pos_h, rel_pos_w, num_heads,
                  head_group, interpret):
    return _win_qkv_fwd_only(x, w, b, rel_pos_h, rel_pos_w,
                             num_heads, head_group, interpret)


def _win_qkv_fwd_only(x, w, b, rel_pos_h, rel_pos_w, num_heads,
                      head_group, interpret):
    nw, n, c = x.shape
    hd = c // num_heads
    side = rel_pos_h.shape[0]
    assert side * side == n
    scale = hd**-0.5
    w_heads, b_heads, rht, rwt = _win_qkv_layouts(
        w, b, rel_pos_h, rel_pos_w, num_heads, x.dtype,
    )
    hg = head_group or _pick_head_group(num_heads, hd, c)
    n_groups = num_heads // hg
    out = pl.pallas_call(
        functools.partial(_win_qkv_kernel, hd=hd, side=side, scale=scale),
        # head groups OUTER so the weight block stays resident across the
        # window sweep (the inner dim revisits the same W/b/table blocks)
        grid=(n_groups, nw),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda g, wi: (wi, 0, 0)),
            pl.BlockSpec((hg, c, 3 * hd), lambda g, wi: (g, 0, 0)),
            pl.BlockSpec((hg, 1, 3 * hd), lambda g, wi: (g, 0, 0)),
            pl.BlockSpec((hd, n), lambda g, wi: (0, 0)),
            pl.BlockSpec((hd, n), lambda g, wi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, hg * hd), lambda g, wi: (wi, 0, g)),
        out_shape=jax.ShapeDtypeStruct((nw, n, c), x.dtype),
        # the resident weight block is 4.9 MB at SAM-H (hg=8 is the
        # smallest 128-lane-aligned head group at hd=80); with input
        # staging copies the scoped stack reaches ~18.2 MB inside the full
        # model, past the 16 MB default — raise the cap for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, w_heads, b_heads, rht, rwt)
    return out


def _win_qkv_core_fwd(x, w, b, rel_pos_h, rel_pos_w, num_heads,
                      head_group, interpret):
    out = _win_qkv_fwd_only(x, w, b, rel_pos_h, rel_pos_w,
                            num_heads, head_group, interpret)
    return out, (x, w, b, rel_pos_h, rel_pos_w)


def _win_qkv_core_bwd(num_heads, head_group, interpret, res, do):
    """Backward by exact fp32 recompute in XLA: training regimes see few
    windows (256² crops → 4/image), so materializing the (NW, H, N, N)
    softmax only in the backward is cheap (house pattern: `_win_core_bwd`)."""
    x, w, b, rel_pos_h, rel_pos_w = res
    if b is None:
        ref = lambda x_, w_, rh_, rw_: _win_qkv_ref(
            x_, w_, None, rh_, rw_, num_heads
        )
        _, vjp = jax.vjp(ref, x, w, rel_pos_h, rel_pos_w)
        dx, dw, drh, drw = vjp(do)
        return dx, dw, None, drh, drw
    _, vjp = jax.vjp(
        lambda x_, w_, b_, rh_, rw_: _win_qkv_ref(
            x_, w_, b_, rh_, rw_, num_heads
        ),
        x, w, b, rel_pos_h, rel_pos_w,
    )
    dx, dw, db, drh, drw = vjp(do)
    return dx, dw, db, drh, drw


_win_qkv_core.defvjp(_win_qkv_core_fwd, _win_qkv_core_bwd)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "head_group", "interpret")
)
def window_qkv_attention(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    num_heads: int,
    head_group: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused qkv projection + decomposed rel-pos window attention.

    Args:
        x: (NW, N, C) LN'd window tokens (N = side², zero-padded windows
            included — the reference projects the pad through qkv too,
            `image_encoder.py:128-193`).
        w/b: the qkv Dense parameters, (C, 3C) and (3C,) (b may be None).
        rel_pos_h/w: gathered (side, side, hd) tables.
    Returns: (NW, N, C) attention output (head outputs lane-concatenated),
    ready for the output projection. Differentiable in x/w/b/tables.
    """
    return _win_qkv_core(x, w, b, rel_pos_h, rel_pos_w, num_heads,
                         head_group, interpret)
