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

from typing import Any, Dict, List, Sequence, Tuple

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


_STAGES = (
    # (shared-skip index, conv prefix, n convs, upsampler name)
    (3, "d3_convs", 3, "d3_up"),
    (2, "d2_convs", 2, "d2_up"),
    (1, "d1_convs", 2, "d1_up"),
    (0, "d0_convs", 2, None),
)


def fused_towers(
    params: Dict,
    batch_stats: Dict,
    skips: Sequence[jnp.ndarray],
    z4: jnp.ndarray,
    dtype: Any,
    branches: Sequence[str] = BRANCHES,
) -> List[jnp.ndarray]:
    """Run the three upsampling towers jointly; returns per-branch logits."""
    p = list(skips)  # p[0]..p[3]
    xs = [
        _conv_t2x2(
            z4,
            params[br]["bottleneck_upsampler"]["kernel"],
            params[br]["bottleneck_upsampler"]["bias"],
            dtype,
        )
        for br in branches
    ]
    for skip_i, prefix, n_convs, up_name in _STAGES:
        ps = p[skip_i].astype(dtype)
        cp = ps.shape[-1]
        # conv1: fold BN, split kernel at the concat boundary, merge the
        # shared halves across towers into one full-lane conv
        folded = [
            _folded_conv(
                params[br][f"{prefix}_0"],
                batch_stats[br][f"{prefix}_0"],
            )
            for br in branches
        ]
        f_out = folded[0][0].shape[-1]
        kp_cat = jnp.concatenate([k[:, :, :cp, :] for k, _ in folded], -1)
        shared = _conv(ps, kp_cat, dtype)
        for t, br in enumerate(branches):
            k, b = folded[t]
            h = shared[..., t * f_out : (t + 1) * f_out]
            h = h + _conv(xs[t], k[:, :, cp:, :], dtype)
            h = jax.nn.relu(h + b.astype(dtype))
            for ci in range(1, n_convs):
                kc, bc = _folded_conv(
                    params[br][f"{prefix}_{ci}"],
                    batch_stats[br][f"{prefix}_{ci}"],
                )
                h = jax.nn.relu(_conv(h, kc, dtype) + bc.astype(dtype))
            if up_name is not None:
                xs[t] = _conv_t2x2(
                    h,
                    params[br][up_name]["kernel"],
                    params[br][up_name]["bias"],
                    dtype,
                )
            else:
                hd = params[br]["header"]
                xs[t] = _conv(h, hd["kernel"], dtype) + hd["bias"].astype(
                    dtype
                )
    return xs


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
