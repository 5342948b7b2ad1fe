"""Per-stage standalone timings + XLA FLOP counts for the fused decoder
(VERDICT r4 task 2: the per-stage floor table in docs/PERFORMANCE.md).

Measures the fused CellViT-256 decoder (models/fused.py) as FOUR nested
standalone jits on real random-init parameters at the bench shapes
(b8×1024², bf16) — successive deltas isolate the d1 stage, the d0 stage,
and the headers; each segment's FLOPs come from the compiled executable's
own cost analysis, so the achieved TF/s per stage is exact, not estimated:

  J1  bottleneckT + d3 stage + d3up + d2 stage + d2up        (→ 512² xs)
  J2  J1 + d1 stage + d1up (pair-packed)                     (→ 1024² xs)
  J3  J2 + d0 stage (packed pair + tail)                     (= _tower_trunks)
  J4  J3 + W-minor header maps                               (= towers+headers)

Methodology: chained dispatch, chunks of 5, min-of-chunks (CLAUDE.md
MICRO-BENCH PITFALL); inputs generated device-side (a 1 GB skip upload
over the axon tunnel would dominate). Results are recorded in
docs/PERFORMANCE.md ("Per-stage floor table").

Run on the TPU box:  python scripts/decoder_stage_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cellvit_tpu.models.fused import (  # noqa: E402
    BRANCHES,
    _STAGES,
    _blockdiag,
    _conv,
    _conv_t2x2,
    _conv_t2x2_pair,
    _folded_conv,
)

B, TILE = 8, 1024
DTYPE = jnp.bfloat16
WARMUP, CHUNKS, CHUNK = 2, 3, 5


def trunks_prefix(params, batch_stats, skips, z4, n_stages, with_headers):
    """First `n_stages` of the fused tower trunks (models/fused.py
    `_tower_trunks`, same math, truncatable); n_stages=4 + with_headers
    reproduces the full towers+headers segment of `fused_forward_maps`."""
    branches = BRANCHES
    nb = len(branches)
    p = list(skips)
    xs = [
        _conv_t2x2(
            z4,
            params[br]["bottleneck_upsampler"]["kernel"],
            params[br]["bottleneck_upsampler"]["bias"],
            DTYPE,
        )
        for br in branches
    ]

    def folded2(prefix, ci, t):
        return _folded_conv(
            params[branches[t]][f"{prefix}_{ci}"],
            batch_stats[branches[t]][f"{prefix}_{ci}"],
        )

    for skip_i, prefix, n_convs, up_name in _STAGES[: min(n_stages, 3)]:
        ps = p[skip_i].astype(DTYPE)
        cp = ps.shape[-1]
        folded = [
            _folded_conv(
                params[br][f"{prefix}_0"], batch_stats[br][f"{prefix}_0"]
            )
            for br in branches
        ]
        f_out = folded[0][0].shape[-1]
        kp_cat = jnp.concatenate([k[:, :, :cp, :] for k, _ in folded], -1)
        shared = _conv(ps, kp_cat, DTYPE)
        hs = []
        for t, br in enumerate(branches):
            k, b = folded[t]
            h = shared[..., t * f_out : (t + 1) * f_out]
            h = h + _conv(xs[t], k[:, :, cp:, :], DTYPE)
            h = jax.nn.relu(h + b.astype(DTYPE))
            for ci in range(1, n_convs):
                kc, bc = folded2(prefix, ci, t)
                h = jax.nn.relu(_conv(h, kc, DTYPE) + bc.astype(DTYPE))
            hs.append(h)
        up = [params[br][up_name] for br in branches]
        if up_name == "d1_up":
            xs = [
                _conv_t2x2_pair(
                    hs[0], up[0]["kernel"], up[0]["bias"],
                    hs[1], up[1]["kernel"], up[1]["bias"], DTYPE,
                )
            ] + [
                _conv_t2x2(hs[t], up[t]["kernel"], up[t]["bias"], DTYPE)
                for t in range(2, nb)
            ]
        else:
            xs = [
                _conv_t2x2(hs[t], up[t]["kernel"], up[t]["bias"], DTYPE)
                for t in range(nb)
            ]
    if n_stages <= 3:
        return xs

    skip_i, prefix, n_convs, _ = _STAGES[-1]
    ps = p[skip_i].astype(DTYPE)
    cp = ps.shape[-1]
    folded = [
        _folded_conv(params[br][f"{prefix}_0"], batch_stats[br][f"{prefix}_0"])
        for br in branches
    ]
    kp01 = jnp.concatenate(
        [folded[0][0][:, :, :cp, :], folded[1][0][:, :, :cp, :]], -1
    )
    sh01 = _conv(ps, kp01, DTYPE)
    kx = _blockdiag(folded[0][0][:, :, cp:, :], folded[1][0][:, :, cp:, :])
    bx = jnp.concatenate([folded[0][1], folded[1][1]])
    h01 = jax.nn.relu(sh01 + _conv(xs[0], kx, DTYPE) + bx.astype(DTYPE))
    for ci in range(1, n_convs):
        (kc0, bc0), (kc1, bc1) = folded2(prefix, ci, 0), folded2(prefix, ci, 1)
        h01 = jax.nn.relu(
            _conv(h01, _blockdiag(kc0, kc1), DTYPE)
            + jnp.concatenate([bc0, bc1]).astype(DTYPE)
        )
    k, b = folded[2]
    cat = jnp.concatenate([xs[1], ps], -1)
    k_cat = jnp.concatenate([k[:, :, cp:, :], k[:, :, :cp, :]], 2)
    h = jax.nn.relu(_conv(cat, k_cat, DTYPE) + b.astype(DTYPE))
    for ci in range(1, n_convs):
        kc, bc = folded2(prefix, ci, 2)
        h = jax.nn.relu(_conv(h, kc, DTYPE) + bc.astype(DTYPE))
    if not with_headers:
        return h01, h

    hd = {br: params[br]["header"] for br in BRANCHES}

    def header_cmajor(hx, hd0, hd1=None):
        if hd1 is None:
            kk = hd0["kernel"][0, 0]
            bb = hd0["bias"]
        else:
            k0, k1 = hd0["kernel"][0, 0], hd1["kernel"][0, 0]
            ci0, co0 = k0.shape
            ci1, co1 = k1.shape
            kk = jnp.concatenate([
                jnp.concatenate([k0, jnp.zeros((ci0, co1), k0.dtype)], -1),
                jnp.concatenate([jnp.zeros((ci1, co0), k1.dtype), k1], -1),
            ], 0)
            bb = jnp.concatenate([hd0["bias"], hd1["bias"]])
        o = jnp.einsum(
            "bhwc,cf->bfhw", hx, kk.astype(DTYPE),
            preferred_element_type=DTYPE,
        )
        return o + bb.astype(DTYPE)[None, :, None, None]

    oh = header_cmajor(h01, hd[BRANCHES[0]], hd[BRANCHES[1]])
    nt = header_cmajor(h, hd[BRANCHES[2]])
    nbm = oh[:, :2].astype(jnp.float32)
    np_prob = jax.nn.sigmoid(nbm[:, 1] - nbm[:, 0])
    return np_prob, oh[:, 2].astype(jnp.float32), oh[:, 3].astype(jnp.float32), nt


def main() -> None:
    import argparse

    from cellvit_tpu.models import CellViT256

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="1/8-scale spatial dims on CPU (logic check only)")
    args = ap.parse_args()
    s = 8 if args.tiny else 1
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    model = CellViT256(
        num_nuclei_classes=6, num_tissue_classes=19, dtype=DTYPE
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False
    )
    dec_params = {br: variables["params"][br] for br in BRANCHES}
    dec_bs = {br: variables["batch_stats"][br] for br in BRANCHES}
    dec_params = jax.device_put(dec_params)
    dec_bs = jax.device_put(dec_bs)

    @jax.jit
    def make_inputs(key):
        ks = jax.random.split(key, 5)
        skips = [
            jax.random.normal(ks[0], (B, 1024 // s, 1024 // s, 64), DTYPE),
            jax.random.normal(ks[1], (B, 512 // s, 512 // s, 128), DTYPE),
            jax.random.normal(ks[2], (B, 256 // s, 256 // s, 256), DTYPE),
            jax.random.normal(ks[3], (B, 128 // s, 128 // s, 312), DTYPE),
        ]
        z4 = jax.random.normal(ks[4], (B, 64 // s, 64 // s, 384), DTYPE)
        return skips, z4

    skips, z4 = make_inputs(jax.random.PRNGKey(1))
    skips = [jax.block_until_ready(s) for s in skips]

    def scalar_of(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), tree, 0.0
        )

    segs = {
        "J1_d3_d2": partial(trunks_prefix, n_stages=2, with_headers=False),
        "J2_plus_d1": partial(trunks_prefix, n_stages=3, with_headers=False),
        "J3_plus_d0": partial(trunks_prefix, n_stages=4, with_headers=False),
        "J4_plus_headers": partial(trunks_prefix, n_stages=4, with_headers=True),
    }
    report = {}
    for name, fn in segs.items():
        jf = jax.jit(lambda p, bs, sk, z, fn=fn: scalar_of(fn(p, bs, sk, z)))
        t0 = time.perf_counter()
        lowered = jf.lower(dec_params, dec_bs, skips, z4)
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            tf = float(cost.get("flops", 0.0)) / 1e12
        except Exception as e:  # tunnel backends may not expose it
            print(f"cost_analysis unavailable ({e}); flops=0", flush=True)
            tf = 0.0
        for _ in range(WARMUP):
            float(jf(dec_params, dec_bs, skips, z4))
        chunk_ms = []
        for _ in range(CHUNKS):
            t0 = time.perf_counter()
            rs = [jf(dec_params, dec_bs, skips, z4) for _ in range(CHUNK)]
            float(rs[-1])
            chunk_ms.append((time.perf_counter() - t0) / CHUNK * 1e3)
        ms = min(chunk_ms)
        report[name] = {
            "ms": round(ms, 2),
            "tf": round(tf, 3),
            "tf_per_s": round(tf / (ms / 1e3), 1),
            "compile_s": round(compile_s, 1),
            "chunks_ms": [round(c, 2) for c in chunk_ms],
        }
        print(name, json.dumps(report[name]), flush=True)

    j = {k: v["ms"] for k, v in report.items()}
    report["deltas_ms"] = {
        "d3_d2_ups": j["J1_d3_d2"],
        "d1_stage": round(j["J2_plus_d1"] - j["J1_d3_d2"], 2),
        "d0_stage": round(j["J3_plus_d0"] - j["J2_plus_d1"], 2),
        "headers": round(j["J4_plus_headers"] - j["J3_plus_d0"], 2),
        "towers_headers_total": j["J4_plus_headers"],
    }
    report["deltas_tf"] = {
        "d3_d2_ups": report["J1_d3_d2"]["tf"],
        "d1_stage": round(
            report["J2_plus_d1"]["tf"] - report["J1_d3_d2"]["tf"], 3
        ),
        "d0_stage": round(
            report["J3_plus_d0"]["tf"] - report["J2_plus_d1"]["tf"], 3
        ),
        "headers": round(
            report["J4_plus_headers"]["tf"] - report["J3_plus_d0"]["tf"], 3
        ),
    }
    print(json.dumps(report, indent=2))
    Path(REPO / "results" / "decoder_stage_probe.json").write_text(
        json.dumps(report, indent=2)
    )


if __name__ == "__main__":
    main()
