"""Fused inference-time decoder forward for separate-tower CellViT models.

Round-3 decoder profiling (docs/PERFORMANCE.md) showed the three
HoVer-Net towers spend most of their 252 ms in the d0 stage: the 64-channel
convs run at ~45 TF/s — half of that loss is the `concat([p0, x])`
materialization (2.1 GB of HBM traffic per tower at 8×1024²) and the rest
is MXU lane underfill at 64 output channels.

This module computes the SAME math (reference cellvit.py:212-330) from the
standard parameter tree, restructured for the MXU:

* `conv(concat(p, x), W)` is split into `conv(p, Wp) + conv(x, Wx)` —
  no concat buffer (kernel slicing is exact, not an approximation);
* the three towers' shared-input halves are merged into ONE conv
  `conv(p, [Wp_nb | Wp_hv | Wp_nt])` whose 3F output channels fill the
  128-lane MXU (e.g. d0: 64→192 at full rate instead of 3× 128→64 at
  ~45 TF/s);
* BatchNorm (inference mode) is folded into the conv kernels/biases.

Training keeps the flax-module path (train-mode BN + dropout); numerical
agreement with the module path is asserted by tests/test_fused.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

BRANCHES = (
    "nuclei_binary_map_decoder",
    "hv_map_decoder",
    "nuclei_type_maps_decoder",
)

_EPS = 1e-5


def _folded_conv(cp: Dict, bs: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ConvBNRelu params → (kernel', bias') with inference BN folded in."""
    k = cp["conv"]["kernel"]
    b = cp["conv"]["bias"]
    s = cp["bn"]["scale"] / jnp.sqrt(bs["bn"]["var"] + _EPS)
    return k * s, (b - bs["bn"]["mean"]) * s + cp["bn"]["bias"]


def _conv(x: jnp.ndarray, k: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        k.astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


def _conv_t2x2(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
               dtype) -> jnp.ndarray:
    """ConvTranspose2x2 as depth-to-space matmul (models/layers.py)."""
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    wmat = kernel.astype(dtype).reshape(c, 4 * f)
    y = jnp.matmul(
        x.astype(dtype).reshape(b * h * w, c), wmat,
        preferred_element_type=dtype,
    ).reshape(b, h, w, 2, 2, f)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, f)
    return y + bias.astype(dtype)


def _blockdiag(k0: jnp.ndarray, k1: jnp.ndarray) -> jnp.ndarray:
    """[[k0, 0], [0, k1]] over the channel dims of two HWIO kernels.

    The packed conv of two towers' channel-concatenated tensors equals the
    two separate convs exactly (the off-block zeros contribute exact
    floating-point zeros to the reduction)."""
    h, w, ci0, co0 = k0.shape
    _, _, ci1, co1 = k1.shape
    top = jnp.concatenate([k0, jnp.zeros((h, w, ci0, co1), k0.dtype)], -1)
    bot = jnp.concatenate([jnp.zeros((h, w, ci1, co0), k1.dtype), k1], -1)
    return jnp.concatenate([top, bot], 2)


def _conv_t2x2_pair(
    x0: jnp.ndarray, k0: jnp.ndarray, b0: jnp.ndarray,
    x1: jnp.ndarray, k1: jnp.ndarray, b1: jnp.ndarray, dtype,
) -> jnp.ndarray:
    """Two towers' ConvTranspose2x2, emitted channel-packed.

    The concat happens at the pre-interleave (B, H, W, 2, 2, F) stage where
    buffers are unpadded; emitting 2F=128 channels directly avoids the 2×
    HBM lane padding every (…, 64) tensor pays at 1024² (measured: XLA pads
    bf16[8,1024,1024,64] to 2× its size in T(8,128) layout)."""
    b, h, w, c = x0.shape
    f = k0.shape[-1]

    def half(x, k):
        wmat = k.astype(dtype).reshape(c, 4 * f)
        return jnp.matmul(
            x.astype(dtype).reshape(b * h * w, c), wmat,
            preferred_element_type=dtype,
        ).reshape(b, h, w, 2, 2, f)

    y = jnp.concatenate([half(x0, k0), half(x1, k1)], -1)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, 2 * f)
    return y + jnp.concatenate([b0, b1]).astype(dtype)


_STAGES = (
    # (shared-skip index, conv prefix, n convs, upsampler name)
    (3, "d3_convs", 3, "d3_up"),
    (2, "d2_convs", 2, "d2_up"),
    (1, "d1_convs", 2, "d1_up"),
    (0, "d0_convs", 2, None),
)


def _tower_trunks(
    params: Dict,
    batch_stats: Dict,
    skips: Sequence[jnp.ndarray],
    z4: jnp.ndarray,
    dtype: Any,
    branches: Sequence[str] = BRANCHES,
) -> Tuple[Optional[jnp.ndarray], List[jnp.ndarray]]:
    """All tower stages up to (not including) the 1×1 header convs.

    Returns (h01, tails): `h01` is the towers-0+1 channel-packed 128-wide
    d0 activation (None when fewer than 2 branches), `tails` the remaining
    towers' 64-channel activations.

    The d0 stage (1024²×64 channels) runs towers 0+1 channel-packed as one
    128-wide tensor with block-diagonal kernels: 64-channel bf16 buffers are
    lane-padded 2× in HBM, so the packed form halves the d0 stage's HBM
    traffic and exactly fills the 128 MXU lanes (measured: two packed 64→64
    convs 21 ms vs 29 ms separate at 8×1024²; bit-exact by block-diagonal
    zero padding)."""
    p = list(skips)  # p[0]..p[3]
    nb = len(branches)
    xs = [
        _conv_t2x2(
            z4,
            params[br]["bottleneck_upsampler"]["kernel"],
            params[br]["bottleneck_upsampler"]["bias"],
            dtype,
        )
        for br in branches
    ]

    def conv1_shared(skip_i, prefix):
        # conv1: fold BN, split kernel at the concat boundary, merge the
        # shared halves across towers into one full-lane conv
        ps = p[skip_i].astype(dtype)
        cp = ps.shape[-1]
        folded = [
            _folded_conv(
                params[br][f"{prefix}_0"],
                batch_stats[br][f"{prefix}_0"],
            )
            for br in branches
        ]
        f_out = folded[0][0].shape[-1]
        kp_cat = jnp.concatenate([k[:, :, :cp, :] for k, _ in folded], -1)
        return _conv(ps, kp_cat, dtype), folded, cp, f_out

    def folded2(prefix, ci, t):
        return _folded_conv(
            params[branches[t]][f"{prefix}_{ci}"],
            batch_stats[branches[t]][f"{prefix}_{ci}"],
        )

    # d3 / d2 / d1: per-tower convs (128–512 channels, already lane-aligned)
    for skip_i, prefix, n_convs, up_name in _STAGES[:-1]:
        shared, folded, cp, f_out = conv1_shared(skip_i, prefix)
        hs = []
        for t, br in enumerate(branches):
            k, b = folded[t]
            h = shared[..., t * f_out : (t + 1) * f_out]
            h = h + _conv(xs[t], k[:, :, cp:, :], dtype)
            h = jax.nn.relu(h + b.astype(dtype))
            for ci in range(1, n_convs):
                kc, bc = folded2(prefix, ci, t)
                h = jax.nn.relu(_conv(h, kc, dtype) + bc.astype(dtype))
            hs.append(h)
        up = [params[br][up_name] for br in branches]
        if up_name == "d1_up" and nb >= 2:
            # emit towers 0+1 packed for the d0 stage
            xs = [
                _conv_t2x2_pair(
                    hs[0], up[0]["kernel"], up[0]["bias"],
                    hs[1], up[1]["kernel"], up[1]["bias"], dtype,
                )
            ] + [
                _conv_t2x2(hs[t], up[t]["kernel"], up[t]["bias"], dtype)
                for t in range(2, nb)
            ]
        else:
            xs = [
                _conv_t2x2(hs[t], up[t]["kernel"], up[t]["bias"], dtype)
                for t in range(nb)
            ]

    # d0: towers 0+1 channel-packed with block-diagonal kernels; the
    # remaining towers pack their x with the 64-channel skip into one
    # 128-wide conv input — a lone 64→64 conv runs at ~38 TF/s on the MXU
    # (half-filled lanes, 2×-padded HBM) while the packed [x|p0] 128→64
    # form measures 52.0 vs 54.7 ms for the whole d0c1 stage (r4 probe)
    skip_i, prefix, n_convs, _ = _STAGES[-1]
    ps = p[skip_i].astype(dtype)
    cp = ps.shape[-1]
    folded = [
        _folded_conv(params[br][f"{prefix}_0"], batch_stats[br][f"{prefix}_0"])
        for br in branches
    ]
    h01: Optional[jnp.ndarray] = None
    if nb >= 2:
        # shared-skip halves of towers 0+1 merged into one 64→128 conv
        kp01 = jnp.concatenate(
            [folded[0][0][:, :, :cp, :], folded[1][0][:, :, :cp, :]], -1
        )
        sh01 = _conv(ps, kp01, dtype)
        kx = _blockdiag(folded[0][0][:, :, cp:, :], folded[1][0][:, :, cp:, :])
        bx = jnp.concatenate([folded[0][1], folded[1][1]])
        h01 = jax.nn.relu(sh01 + _conv(xs[0], kx, dtype) + bx.astype(dtype))
        for ci in range(1, n_convs):
            (kc0, bc0), (kc1, bc1) = folded2(prefix, ci, 0), folded2(prefix, ci, 1)
            h01 = jax.nn.relu(
                _conv(h01, _blockdiag(kc0, kc1), dtype)
                + jnp.concatenate([bc0, bc1]).astype(dtype)
            )
    x_off = 1 if nb >= 2 else 0  # xs[0] is the packed pair when nb >= 2
    tails: List[jnp.ndarray] = []
    for t in range(2 * x_off, nb):
        k, b = folded[t]
        # conv(concat([x, p0]), [Wx; Wp]) == conv(p0, Wp) + conv(x, Wx):
        # one full-lane 128→64 conv instead of two half-lane 64→64s
        cat = jnp.concatenate([xs[t - x_off], ps], -1)
        k_cat = jnp.concatenate([k[:, :, cp:, :], k[:, :, :cp, :]], 2)
        h = jax.nn.relu(_conv(cat, k_cat, dtype) + b.astype(dtype))
        for ci in range(1, n_convs):
            kc, bc = folded2(prefix, ci, t)
            h = jax.nn.relu(_conv(h, kc, dtype) + bc.astype(dtype))
        tails.append(h)
    return h01, tails


def fused_towers(
    params: Dict,
    batch_stats: Dict,
    skips: Sequence[jnp.ndarray],
    z4: jnp.ndarray,
    dtype: Any,
    branches: Sequence[str] = BRANCHES,
) -> List[jnp.ndarray]:
    """Run the upsampling towers jointly; returns per-branch logits
    (channel-minor, the `model.apply` layout)."""
    nb = len(branches)
    h01, tails = _tower_trunks(params, batch_stats, skips, z4, dtype, branches)
    outs: List[jnp.ndarray] = []
    if nb >= 2:
        hd0 = params[branches[0]]["header"]
        hd1 = params[branches[1]]["header"]
        o_split = hd0["kernel"].shape[-1]
        oh = _conv(h01, _blockdiag(hd0["kernel"], hd1["kernel"]), dtype)
        oh = oh + jnp.concatenate([hd0["bias"], hd1["bias"]]).astype(dtype)
        outs = [oh[..., :o_split], oh[..., o_split:]]
    for t, h in enumerate(tails, start=2 if nb >= 2 else 0):
        hd = params[branches[t]]["header"]
        outs.append(_conv(h, hd["kernel"], dtype) + hd["bias"].astype(dtype))
    return outs


def fused_forward(
    model, variables: Dict, x: jnp.ndarray, retrieve_tokens: bool = False
) -> Dict:
    """Inference forward for a separate-tower CellViT (HV heads) with the
    fused decoder path. Matches `model.apply(variables, x, train=False)`
    up to BN-folding rounding (≤1e-4 fp32)."""
    extra, skips, z4 = model.apply(
        variables, x, method="encode_features"
    )
    out = dict(extra)
    if retrieve_tokens:
        out["tokens"] = z4
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    nb, hv, nt = fused_towers(
        params, batch_stats, skips, z4, model.dtype
    )
    if model.regression_loss:
        out["nuclei_binary_map"] = nb[..., :2]
        out["regression_map"] = nb[..., 2:]
    else:
        out["nuclei_binary_map"] = nb
    out["hv_map"] = hv
    out["nuclei_type_map"] = nt
    return out


def fused_forward_maps(
    model, variables: Dict, x: jnp.ndarray, retrieve_tokens: bool = False
) -> Dict:
    """Layout-optimized inference forward emitting postproc-ready maps.

    A channel-minor (B, H, W, C<128) tensor is lane-padded to 128 in HBM on
    TPU (a (…, 2) fp32 map costs 64× its logical bytes), so the narrow
    header outputs are emitted W-minor instead: the 1×1 header convs become
    matmuls written as (B, C, H, W), and the nucleus probability collapses
    to one scalar map. Measured −3.5 ms over the channel-minor headers at
    8×1024² (round 4). Returns:

      tissue_types     (B, T) logits            (as `fused_forward`)
      np_prob          (B, H, W) f32            == softmax(nb)[..., 1]
                       (sigmoid(nb1−nb0) — identical incl. the 0.5
                       threshold decision)
      hv0 / hv1        (B, H, W) f32            hv_map channels
      type_map_cmajor  (B, num_classes, H, W)   nuclei_type_map, W-minor
      [reg0 / reg1     (B, H, W) f32]           regression_map channels
      [tokens]                                   if retrieve_tokens

    Consumers: `bench.py`, `ops.hv_postproc.instance_map_batch_maps`.
    Parity with `fused_forward` is asserted in tests/test_fused.py."""
    extra, skips, z4 = model.apply(variables, x, method="encode_features")
    out = dict(extra)
    if retrieve_tokens:
        out["tokens"] = z4
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    h01, tails = _tower_trunks(
        params, batch_stats, skips, z4, model.dtype
    )

    def header_cmajor(h, hd0, hd1=None):
        # 1×1 conv → (B, C, H, W) matmul; block-diagonal when two towers
        # share the packed 128-wide activation
        if hd1 is None:
            k = hd0["kernel"][0, 0]
            b = hd0["bias"]
        else:
            k0, k1 = hd0["kernel"][0, 0], hd1["kernel"][0, 0]
            ci0, co0 = k0.shape
            ci1, co1 = k1.shape
            k = jnp.concatenate([
                jnp.concatenate([k0, jnp.zeros((ci0, co1), k0.dtype)], -1),
                jnp.concatenate([jnp.zeros((ci1, co0), k1.dtype), k1], -1),
            ], 0)
            b = jnp.concatenate([hd0["bias"], hd1["bias"]])
        o = jnp.einsum(
            "bhwc,cf->bfhw", h, k.astype(model.dtype),
            preferred_element_type=model.dtype,
        )
        return o + b.astype(model.dtype)[None, :, None, None]

    hd = {br: params[br]["header"] for br in BRANCHES}
    oh = header_cmajor(h01, hd[BRANCHES[0]], hd[BRANCHES[1]])
    nt = header_cmajor(tails[0], hd[BRANCHES[2]])
    n_nb = hd[BRANCHES[0]]["kernel"].shape[-1]
    nb = oh[:, :n_nb].astype(jnp.float32)
    out["np_prob"] = jax.nn.sigmoid(nb[:, 1] - nb[:, 0])
    if model.regression_loss:
        out["reg0"] = nb[:, 2]
        out["reg1"] = nb[:, 3]
    out["hv0"] = oh[:, n_nb].astype(jnp.float32)
    out["hv1"] = oh[:, n_nb + 1].astype(jnp.float32)
    out["type_map_cmajor"] = nt
    return out
