"""Flash-attention kernel tests (interpret mode on CPU)."""

import functools

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


@pytest.mark.parametrize(
    "gh,gw",
    [
        (8, 8),  # n=64 ≤ 256 → whole-window VMEM kernel path
        (16, 20),  # n=320 > 256 → flash (online-softmax) path
    ],
)
def test_flash_attention_relpos_matches_sam_math(rng, gh, gw):
    from cellvit_tpu.models.sam_vit import gather_rel_pos

    b, h, d = 1, 2, 32
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


def test_flash_attention_relpos_windowed_shape(rng):
    """The SAM windowed path routes 14×14 windows through the rel-pos
    flash kernel with windows as the batch dim (models/sam_vit.py):
    N = 196 is not a multiple of the block size, so this exercises the
    single partially-masked key block. Reference: the decomposed-bias
    einsum math of `add_decomposed_rel_pos` (image_encoder.py:354-392)."""
    from cellvit_tpu.models.sam_vit import gather_rel_pos

    b, gh, gw, h, d = 3, 14, 14, 2, 32  # 3 windows, window side 14
    n = gh * gw
    q = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d), dtype=np.float32))
    table_h = jnp.asarray(rng.standard_normal((2 * gh - 1, d), dtype=np.float32))
    table_w = jnp.asarray(rng.standard_normal((2 * gw - 1, d), dtype=np.float32))
    rh = gather_rel_pos(table_h, gh)
    rw = gather_rel_pos(table_w, gw)

    rq = q.reshape(b, gh, gw, h, d)
    bias_h = jnp.einsum("bijnd,ikd->bnijk", rq, rh)
    bias_w = jnp.einsum("bijnd,jld->bnijl", rq, rw)
    bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(b, h, n, n)
    ref = _reference_attention(q, k, v, bias=bias)

    out = flash_attention_relpos(
        q, k, v, rh, rw, grid_hw=(gh, gw), block_q=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_window_attention_matches_reference(rng):
    """Whole-window kernel vs dense attention: N=196 (not a sublane
    multiple — exercises the padded-key masking) and a ragged window
    count (B=5 with window_block=2 — exercises window-batch padding).
    No scale is applied by the kernel (caller folds it)."""
    from cellvit_tpu.ops.attention import window_attention

    for b, n, h, d, dv in [(5, 196, 2, 32, 24), (3, 64, 1, 16, 16)]:
        q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32) * 0.3
        k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32) * 0.3
        v = jnp.asarray(rng.standard_normal((b, n, h, dv)), jnp.float32)
        out = window_attention(q, k, v, window_block=2, interpret=True)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        p = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )


def test_window_attention_vjp_matches_xla(rng):
    """window_attention custom VJP (XLA recompute backward) vs dense."""
    from cellvit_tpu.ops.attention import window_attention

    b, n, h, d = 3, 20, 2, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32) * 0.3
        for _ in range(3)
    )
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)

    def dense(q, k, v):
        p = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k), -1)
        return jnp.vdot(jnp.einsum("bhqk,bkhd->bqhd", p, v), cot)

    def win(q, k, v):
        return jnp.vdot(
            window_attention(q, k, v, window_block=2, interpret=True), cot
        )

    for a, bb in zip(jax.grad(win, (0, 1, 2))(q, k, v),
                     jax.grad(dense, (0, 1, 2))(q, k, v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=3e-5)


def test_flash_attention_vjp_matches_xla(rng):
    """Custom flash VJP: forward + dq/dk/dv vs dense XLA attention."""
    import jax
    import jax.numpy as jnp

    from cellvit_tpu.ops.attention import flash_attention

    def ref_attn(q, k, v):
        d = q.shape[-1]
        a = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k) * d**-0.5, -1)
        return jnp.einsum("bhqk,bkhd->bqhd", a, v)

    for shape in [(1, 37, 2, 16), (2, 512, 2, 32)]:
        q, k, v = (
            jnp.asarray(rng.standard_normal(shape), jnp.float32)
            for _ in range(3)
        )
        cot = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        flash = lambda q, k, v: jnp.vdot(
            flash_attention(q, k, v, block_q=128, block_k=128, interpret=True),
            cot,
        )
        dense = lambda q, k, v: jnp.vdot(ref_attn(q, k, v), cot)
        np.testing.assert_allclose(
            np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                       interpret=True)),
            np.asarray(ref_attn(q, k, v)), atol=2e-5,
        )
        for a, b in zip(jax.grad(flash, (0, 1, 2))(q, k, v),
                        jax.grad(dense, (0, 1, 2))(q, k, v)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.parametrize("gh,gw,bq", [(32, 32, 128), (16, 32, 64)])
def test_flash_relpos_direct_bias_kernel(rng, gh, gw, bq):
    """The direct-bias VMEM route (N > 256, block-divisible grid): d-wide
    q·kᵀ with Bh/Bw added on the logits tile — must match the SAM
    decomposed-bias math exactly, forward and gradients."""
    from cellvit_tpu.models.sam_vit import gather_rel_pos
    from cellvit_tpu.ops import attention as attn_mod

    b, h, d = 1, 2, 32
    n = gh * gw
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32) * 0.5
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32) * 0.5
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    table_h = jnp.asarray(rng.standard_normal((2 * gh - 1, d)), jnp.float32) * 0.3
    table_w = jnp.asarray(rng.standard_normal((2 * gw - 1, d)), jnp.float32) * 0.3
    rh = gather_rel_pos(table_h, gh)
    rw = gather_rel_pos(table_w, gw)

    rq = q.reshape(b, gh, gw, h, d)
    bias_h = jnp.einsum("bijnd,ikd->bnijk", rq, rh)
    bias_w = jnp.einsum("bijnd,jld->bnijl", rq, rw)
    bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(b, h, n, n)
    ref = _reference_attention(q, k, v, bias=bias)

    # confirm the routing picks the direct-bias core for this shape
    blk_k = gw * max(1, 512 // gw)
    assert n % blk_k == 0 and n % bq == 0 and n > 256

    calls = []
    orig = attn_mod._relpos_core

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    attn_mod._relpos_core = spy
    try:
        out = flash_attention_relpos(
            q, k, v, rh, rw, grid_hw=(gh, gw), block_q=bq, interpret=True
        )
    finally:
        attn_mod._relpos_core = orig
    assert calls, "expected the direct-bias kernel route"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # gradients (routed through the augmented-lane VJP)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    flash = lambda *a: jnp.vdot(
        flash_attention_relpos(*a, grid_hw=(gh, gw), block_q=bq,
                               interpret=True), cot)

    def dense(q, k, v, rh, rw):
        rq = q.reshape(b, gh, gw, h, d)
        bhb = jnp.einsum("bijnd,ikd->bnijk", rq, rh)
        bwb = jnp.einsum("bijnd,jld->bnijl", rq, rw)
        bias = (bhb[..., :, None] + bwb[..., None, :]).reshape(b, h, n, n)
        return jnp.vdot(_reference_attention(q, k, v, bias=bias), cot)

    for a, bb in zip(jax.grad(flash, (0, 1, 2, 3, 4))(q, k, v, rh, rw),
                     jax.grad(dense, (0, 1, 2, 3, 4))(q, k, v, rh, rw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)


def test_flash_relpos_vjp_matches_xla(rng):
    """Rel-pos flash VJP: dq/dk/dv and rel-pos-table grads vs dense XLA."""
    import jax
    import jax.numpy as jnp

    from cellvit_tpu.ops.attention import flash_attention_relpos

    gh = gw = 16
    b, h, d = 1, 2, 16
    n = gh * gw

    def ref(q, k, v, rh, rw):
        rq = q.reshape(b, gh, gw, h, d)
        bhb = jnp.einsum("bijnd,ikd->bnijk", rq, rh)
        bwb = jnp.einsum("bijnd,jld->bnijl", rq, rw)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * d**-0.5
        bias = (bhb[..., :, None] + bwb[..., None, :]).reshape(b, h, n, n)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", jax.nn.softmax(attn + bias, -1), v
        )

    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        for _ in range(3)
    )
    rh = jnp.asarray(rng.standard_normal((gh, gh, d)) * 0.3, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((gw, gw, d)) * 0.3, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)

    flash = lambda *a: jnp.vdot(
        flash_attention_relpos(*a, grid_hw=(gh, gw), block_q=64,
                               interpret=True), cot)
    dense = lambda *a: jnp.vdot(ref(*a), cot)
    np.testing.assert_allclose(
        np.asarray(flash_attention_relpos(q, k, v, rh, rw, grid_hw=(gh, gw),
                                          block_q=64, interpret=True)),
        np.asarray(ref(q, k, v, rh, rw)), atol=3e-5,
    )
    for a, bb in zip(jax.grad(flash, (0, 1, 2, 3, 4))(q, k, v, rh, rw),
                     jax.grad(dense, (0, 1, 2, 3, 4))(q, k, v, rh, rw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)


@pytest.mark.parametrize("gh,gw,d", [(14, 14, 80), (16, 16, 64)])
def test_flash_relpos_head_major_layout(rng, gh, gw, d):
    """layout="bhnd" (the SAM encoder fast path: one packed qkv transpose,
    kernel staging becomes a free reshape) must match the token-major
    result and gradients exactly."""
    from cellvit_tpu.ops.attention import flash_attention_relpos

    b, h, n = 2, 2, gh * gw
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        for _ in range(3)
    )
    rh = jnp.asarray(rng.standard_normal((gh, gh, d)) * 0.3, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((gw, gw, d)) * 0.3, jnp.float32)
    hm = lambda x: x.transpose(0, 2, 1, 3)

    tok = lambda q_, k_, v_: flash_attention_relpos(
        q_, k_, v_, rh, rw, grid_hw=(gh, gw), interpret=True)
    hmj = lambda q_, k_, v_: flash_attention_relpos(
        hm(q_), hm(k_), hm(v_), rh, rw, grid_hw=(gh, gw), layout="bhnd",
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(hmj(q, k, v)), np.asarray(tok(q, k, v)), atol=3e-5)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    f1 = lambda *a: jnp.vdot(tok(*a), cot)
    f2 = lambda *a: jnp.vdot(hmj(*a), cot)
    for a, bb in zip(jax.grad(f2, (0, 1, 2))(q, k, v),
                     jax.grad(f1, (0, 1, 2))(q, k, v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)


@pytest.mark.parametrize("c,nh,side", [(128, 4, 14), (160, 2, 14), (64, 2, 4)])
def test_window_qkv_attention_matches_oracle(rng, c, nh, side):
    """Fused per-window qkv+rel-pos attention kernel (the SAM windowed
    fast path: projection, bias and softmax·V in one VMEM program) vs the
    pure-JAX oracle — forward and every gradient (x, W, b, tables)."""
    from cellvit_tpu.ops.attention import _win_qkv_ref, window_qkv_attention

    n = side * side
    nw, hd = 5, c // nh
    x = jnp.asarray(rng.standard_normal((nw, n, c)) * 0.4, jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, 3 * c)) * c**-0.5, jnp.float32)
    b = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    rh = jnp.asarray(rng.standard_normal((side, side, hd)) * 0.2, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((side, side, hd)) * 0.2, jnp.float32)

    ref = _win_qkv_ref(x, w, b, rh, rw, nh)
    out = window_qkv_attention(x, w, b, rh, rw, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # bf16 storage (the production dtype) stays within quantization noise
    outb = window_qkv_attention(
        x.astype(jnp.bfloat16), w, b, rh, rw, nh, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(outb, np.float32), np.asarray(ref), atol=3e-2
    )

    cot = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    f_k = lambda *a: jnp.vdot(
        window_qkv_attention(*a, nh, interpret=True), cot
    )
    f_r = lambda *a: jnp.vdot(_win_qkv_ref(*a, nh), cot)
    gk = jax.grad(f_k, (0, 1, 2, 3, 4))(x, w, b, rh, rw)
    gr = jax.grad(f_r, (0, 1, 2, 3, 4))(x, w, b, rh, rw)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)


def test_window_qkv_attention_no_bias(rng):
    """qkv_bias=False path (b=None) — forward parity and a null bias
    cotangent."""
    from cellvit_tpu.ops.attention import _win_qkv_ref, window_qkv_attention

    c, nh, side = 96, 3, 7
    n, hd = side * side, 96 // 3
    x = jnp.asarray(rng.standard_normal((2, n, c)) * 0.4, jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, 3 * c)) * c**-0.5, jnp.float32)
    rh = jnp.asarray(rng.standard_normal((side, side, hd)) * 0.2, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((side, side, hd)) * 0.2, jnp.float32)
    ref = _win_qkv_ref(x, w, None, rh, rw, nh)
    out = window_qkv_attention(x, w, None, rh, rw, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    g = jax.grad(
        lambda w_: jnp.sum(
            window_qkv_attention(x, w_, None, rh, rw, nh, interpret=True)
        )
    )(w)
    gr = jax.grad(lambda w_: jnp.sum(_win_qkv_ref(x, w_, None, rh, rw, nh)))(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=5e-5)


def test_sam_attention_fused_flag_matches_einsum(rng):
    """SamAttention(fused_window=True, interpret) == the einsum branch —
    the module-level wiring (param extraction, reshape, proj) is what the
    kernel test above cannot see."""
    from unittest import mock

    from cellvit_tpu.models import sam_vit
    from cellvit_tpu.ops import attention as attn_ops

    b, side, c, nh = 2, 14, 128, 4
    x = jnp.asarray(
        rng.standard_normal((b, side, side, c)) * 0.3, jnp.float32
    )
    mod = sam_vit.SamAttention(c, nh, rel_pos_dim=side, dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    base = mod.apply(v, x)  # CPU → einsum branch
    fused_mod = sam_vit.SamAttention(
        c, nh, rel_pos_dim=side, dtype=jnp.float32, fused_window=True
    )
    interp = functools.partial(attn_ops.window_qkv_attention, interpret=True)
    with mock.patch.object(attn_ops, "window_qkv_attention", interp):
        fused = fused_mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=3e-5)
