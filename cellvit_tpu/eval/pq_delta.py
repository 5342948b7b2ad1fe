"""PQ-delta harness: device HV postprocessing vs the reference-exact host
pipeline.

The on-device pipeline (`ops/hv_postproc.py`) replaces the reference's exact
host algorithms (`post_proc_cellvit.py:155-249`) with TPU-friendly
approximations: a quantized-flood watershed (contested ridge pixels can
differ from the heap flood), windowed `remove_small_objects`, and fixed-pass
scan CC. Per-op parity is tested in `tests/test_ops.py`; THIS module
quantifies the composed pipeline's effect on the benchmark metrics (bPQ /
mPQ) on model-like inputs, sweeping the watershed quantization `levels`.

Method: synthesize GT instance/type maps with touching elliptical nuclei,
derive model-like network outputs (blurred + noisy NP probability and HV
maps via the same label engineering the datasets use), then segment with
(a) the exact host oracle `ops/hv_postproc_np.proc_np_hv` and (b) the device
`ops/hv_postproc.instance_map_batch` at each `levels`. Both are scored
against GT with the PanNuke PQ metrics; the report is the paired delta plus
the direct exact↔device agreement PQ.

Run: ``python -m cellvit_tpu.eval.pq_delta [--tiles N] [--size S]``.
Measured results are recorded in docs/PARITY.md.
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence, Tuple

import numpy as np

from cellvit_tpu.data.labels import gen_instance_hv_map
from cellvit_tpu.eval.metrics import get_fast_pq, remap_label
from cellvit_tpu.ops import hv_postproc_np


def make_gt_tile(
    rng: np.random.Generator,
    size: int = 256,
    n_cells: int = 28,
    n_types: int = 5,
    scale: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """GT (inst_map, type_map) with rotated elliptical nuclei.

    Cells are dropped in clusters so a substantial fraction touch — the
    regime where watershed ridge placement actually matters. `scale`
    shrinks nuclei linearly (0.5 emulates 20× magnification, where the
    reference switches to ksize=11 / object_size=3 —
    post_proc_cellvit.py:55-65).
    """
    inst = np.zeros((size, size), np.int32)
    types = np.zeros((size, size), np.int32)
    placed = 0
    anchors: List[Tuple[float, float]] = []
    for _ in range(n_cells * 4):
        if placed >= n_cells:
            break
        if anchors and rng.random() < 0.55:
            # cluster: drop next to an existing cell so boundaries touch
            ay, ax = anchors[rng.integers(len(anchors))]
            ang = rng.uniform(0, 2 * np.pi)
            d = rng.uniform(8, 14) * scale
            cy, cx = ay + d * np.sin(ang), ax + d * np.cos(ang)
        else:
            cy, cx = rng.uniform(12, size - 12), rng.uniform(12, size - 12)
        if not (8 <= cy < size - 8 and 8 <= cx < size - 8):
            continue
        a = rng.uniform(4.5, 9.0) * scale  # semi-axes
        b = rng.uniform(3.5 * scale, a)
        th = rng.uniform(0, np.pi)
        ct, st = np.cos(th), np.sin(th)
        # evaluate the ellipse only inside its bounding window — pixels at
        # distance > a from the center cannot satisfy (u/a)²+(v/b)² ≤ 1
        # (a ≥ b), so this is bit-identical to the full-grid evaluation
        # and O(a²) instead of O(size²) per nucleus (the full grid cost
        # 26.5 s/tile at 1024²; rng draw order is unchanged)
        r = int(np.ceil(a)) + 1
        y0, y1 = max(0, int(cy) - r), min(size, int(cy) + r + 2)
        x0, x1 = max(0, int(cx) - r), min(size, int(cx) + r + 2)
        yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float32)
        u = (xx - cx) * ct + (yy - cy) * st
        v = -(xx - cx) * st + (yy - cy) * ct
        win = inst[y0:y1, x0:x1]
        sel = ((u / a) ** 2 + (v / b) ** 2 <= 1.0) & (win == 0)
        if sel.sum() < 15:
            continue
        placed += 1
        win[sel] = placed
        types[y0:y1, x0:x1][sel] = int(rng.integers(1, n_types + 1))
        anchors.append((cy, cx))
    return inst, types


def model_like_outputs(
    rng: np.random.Generator, inst: np.ndarray, noise: float = 0.05
) -> Tuple[np.ndarray, np.ndarray]:
    """GT instances → plausible network outputs (np_prob, hv_map).

    The NP probability is the binary mask smoothed and perturbed; the HV map
    is the exact GT target (`data/labels.py:gen_instance_hv_map`, the maps
    the network regresses toward) plus blur + noise.
    """
    import cv2

    fg = (inst > 0).astype(np.float32)
    np_prob = cv2.GaussianBlur(fg, (5, 5), 0)
    np_prob = np.clip(
        0.9 * np_prob + 0.05 + rng.normal(0, noise, fg.shape), 0.0, 1.0
    ).astype(np.float32)
    hv = gen_instance_hv_map(inst)
    hv = np.stack(
        [cv2.GaussianBlur(hv[..., i], (3, 3), 0) for i in range(2)], axis=-1
    )
    hv = (hv + rng.normal(0, noise, hv.shape)).astype(np.float32)
    return np_prob, hv


def render_tile_image(
    rng: np.random.Generator, inst: np.ndarray, types: np.ndarray
) -> np.ndarray:
    """Deterministic-ish H&E-like rendering of a GT tile: light stroma,
    dark basophilic nuclei with per-type tint. Gives the real-model mode a
    learnable image→(NP, HV) mapping."""
    import cv2

    size = inst.shape[0]
    img = np.full((size, size, 3), 0.82, np.float32)
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    tint = np.array(
        [[0.35, 0.2, 0.5], [0.3, 0.25, 0.45], [0.4, 0.15, 0.45],
         [0.3, 0.2, 0.55], [0.35, 0.3, 0.5], [0.25, 0.2, 0.4]],
        np.float32,
    )
    fg = inst > 0
    img[fg] = tint[(types[fg] - 1) % len(tint)]
    img += rng.normal(0, 0.015, img.shape).astype(np.float32)
    img = cv2.GaussianBlur(img, (3, 3), 0)
    return np.clip(img, 0, 1).astype(np.float32)


def real_model_outputs(
    tiles: List[Tuple[np.ndarray, np.ndarray]],
    train_steps: int = 150,
    seed: int = 0,
    embed_dim: int = 96,
    depth: int = 4,
    crop: int = 64,
    batch: int = 8,
    lr: float = 1e-3,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Train a small CellViT on rendered GT tiles, then predict the
    harness inputs with it — the measured PQ delta then covers *real*
    network error structure (asymmetric HV fields, fragmented NP blobs)
    instead of GT+blur+noise (VERDICT r2 weak item 6).

    Returns per-tile (np_prob, hv) predicted by the trained model.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from cellvit_tpu.data.labels import gen_instance_hv_map
    from cellvit_tpu.models.cellvit import CellViT

    rng_np = np.random.default_rng(seed + 1)
    imgs = [render_tile_image(rng_np, i, t) for i, t in tiles]
    hv_gt = [gen_instance_hv_map(i) for i, _ in tiles]

    model = CellViT(
        num_nuclei_classes=6,
        num_tissue_classes=2,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=4,
        extract_layers=(1, 2, 3, 4),
        encoder_type="histo",
    )
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, crop, crop, 3)), train=False
    )
    tx = optax.adamw(lr)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, imgs_b, nb_b, hv_b):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs_b,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        nb_logits = out["nuclei_binary_map"]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            nb_logits, nb_b
        ).mean()
        mse = jnp.mean((out["hv_map"] - hv_b) ** 2)
        return ce + mse, updates["batch_stats"]

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs_b, nb_b, hv_b):
        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, imgs_b, nb_b, hv_b)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates),
            batch_stats,
            opt_state,
            loss,
        )

    size = tiles[0][0].shape[0]
    for step in range(train_steps):
        ib, nb, hb = [], [], []
        for _ in range(batch):
            ti = rng_np.integers(len(tiles))
            y0 = int(rng_np.integers(0, size - crop + 1))
            x0 = int(rng_np.integers(0, size - crop + 1))
            ib.append(imgs[ti][y0 : y0 + crop, x0 : x0 + crop])
            nb.append(
                (tiles[ti][0][y0 : y0 + crop, x0 : x0 + crop] > 0).astype(
                    np.int32
                )
            )
            hb.append(hv_gt[ti][y0 : y0 + crop, x0 : x0 + crop])
        params, batch_stats, opt_state, _ = train_step(
            params, batch_stats, opt_state,
            jnp.asarray(np.stack(ib)), jnp.asarray(np.stack(nb)),
            jnp.asarray(np.stack(hb)),
        )

    @jax.jit
    def predict(params, batch_stats, imgs_b):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs_b,
            train=False,
        )
        prob = jax.nn.softmax(
            out["nuclei_binary_map"].astype(jnp.float32), -1
        )[..., 1]
        return prob, out["hv_map"].astype(jnp.float32)

    preds: List[Tuple[np.ndarray, np.ndarray]] = []
    for i in range(0, len(tiles), 4):
        probs, hvs = predict(
            params, batch_stats, jnp.asarray(np.stack(imgs[i : i + 4]))
        )
        for j in range(probs.shape[0]):
            preds.append((np.asarray(probs[j]), np.asarray(hvs[j])))
    return preds


def _binary_pq(gt_inst: np.ndarray, pred_inst: np.ndarray) -> float:
    [_, _, pq], _ = get_fast_pq(remap_label(gt_inst), remap_label(pred_inst))
    return pq


def _typed_pq(
    gt_inst: np.ndarray,
    gt_types: np.ndarray,
    pred_inst: np.ndarray,
    n_types: int,
) -> List[float]:
    """Per-type PQ, with predicted types assigned by GT-majority vote over
    each predicted instance (isolates the segmentation delta — the type
    branch is identical between pipelines)."""
    pred_inst = remap_label(pred_inst)
    # majority vote for every predicted instance in one joint bincount
    # (the per-pid full-image masks cost ~450 × 1M compares at 1024²)
    n_pred = int(pred_inst.max())
    counts = np.bincount(
        pred_inst.ravel().astype(np.int64) * (n_types + 1) + gt_types.ravel(),
        minlength=(n_pred + 1) * (n_types + 1),
    ).reshape(n_pred + 1, n_types + 1)
    counts[:, 0] = 0
    lab_type = np.where(counts.sum(1) > 0, counts.argmax(1), 0)
    lab_type[0] = 0
    pred_types = lab_type[pred_inst]
    out = []
    for t in range(1, n_types + 1):
        g = np.where(gt_types == t, gt_inst, 0)
        p = np.where(pred_types == t, pred_inst, 0)
        if g.max() == 0 and p.max() == 0:
            out.append(np.nan)
            continue
        [_, _, pq], _ = get_fast_pq(remap_label(g), remap_label(p))
        out.append(pq)
    return out


def measure_pq_delta(
    n_tiles: int = 200,
    size: int = 256,
    levels_list: Sequence[int] = (64, 128, 256),
    magnification: int = 40,
    seed: int = 0,
    batch: int = 8,
    n_types: int = 5,
    source: str = "synthetic",
    train_steps: int = 150,
    n_cells: int = 0,
) -> Dict:
    """Run the harness; returns the report dict (see module docstring).

    source: "synthetic" = GT + blur + noise (fast, optimistic error
    structure); "model" = predictions of a small CellViT trained on
    rendered GT tiles (real network error structure). At
    magnification=20 the GT nuclei are half-size and the (11, 3)
    postprocessing parameters are exercised.
    """
    import jax.numpy as jnp

    from cellvit_tpu.ops.hv_postproc import instance_map_batch
    from cellvit_tpu.ops.hv_postproc_np import magnification_params

    object_size, ksize = magnification_params(magnification)
    # 20×: nuclei shrink linearly. 0.85 of the synthetic base puts the
    # exact host pipeline at bPQ ≈ 0.55 — the same regime the reference's
    # x20 ablation reports (logs_paper SAM-H x20: bPQ 0.55, SURVEY §6);
    # a naive 0.5 makes nuclei smaller than the 5×5 marker erosion and
    # degenerates both pipelines to bPQ ≈ 0.
    scale = 1.0 if magnification >= 40 else 0.85
    rng = np.random.default_rng(seed)
    # density scales with tile area: 28 cells at 256² → ~450 at the
    # production 1024² tile size (the bench regime, VERDICT r3 item 6)
    if n_cells <= 0:
        n_cells = int(round(28 * (size / 256) ** 2))
    gt = [
        make_gt_tile(
            rng, size=size, n_cells=n_cells, n_types=n_types, scale=scale
        )
        for _ in range(n_tiles)
    ]
    if source == "model":
        preds = real_model_outputs(gt, train_steps=train_steps, seed=seed)
        tiles = [
            (inst, types, p, h)
            for (inst, types), (p, h) in zip(gt, preds)
        ]
    else:
        tiles = []
        for inst, types in gt:
            np_prob, hv = model_like_outputs(rng, inst)
            tiles.append((inst, types, np_prob, hv))

    exact = [
        hv_postproc_np.proc_np_hv(p, h, object_size=object_size, ksize=ksize)
        for _, _, p, h in tiles
    ]

    device: Dict[int, List[np.ndarray]] = {lv: [] for lv in levels_list}
    for lv in levels_list:
        for i in range(0, n_tiles, batch):
            chunk = tiles[i : i + batch]
            probs = jnp.asarray(np.stack([t[2] for t in chunk]))
            hvs = jnp.asarray(np.stack([t[3] for t in chunk]))
            out = np.asarray(
                instance_map_batch(
                    probs, hvs, object_size=object_size, ksize=ksize, levels=lv
                )
            )
            device[lv].extend(out)

    def score(preds: List[np.ndarray]) -> Tuple[float, float]:
        bpqs, typed = [], []
        for (inst, types, _, _), pred in zip(tiles, preds):
            bpqs.append(_binary_pq(inst, pred))
            typed.append(_typed_pq(inst, types, pred, n_types))
        per_type = np.nanmean(np.asarray(typed, np.float64), axis=0)
        return float(np.mean(bpqs)), float(np.nanmean(per_type))

    exact_bpq, exact_mpq = score(exact)
    report: Dict = {
        "n_tiles": n_tiles,
        "size": size,
        "magnification": magnification,
        "source": source,
        "n_cells": n_cells,
        "mean_gt_instances": float(np.mean([i.max() for i, _ in gt])),
        "mean_exact_instances": float(np.mean([e.max() for e in exact])),
        "exact": {"bPQ": exact_bpq, "mPQ": exact_mpq},
        "levels": {},
    }
    for lv in levels_list:
        bpq, mpq = score(device[lv])
        agree = float(
            np.mean([_binary_pq(e, d) for e, d in zip(exact, device[lv])])
        )
        report["levels"][lv] = {
            "bPQ": bpq,
            "mPQ": mpq,
            "delta_bPQ": bpq - exact_bpq,
            "delta_mPQ": mpq - exact_mpq,
            "agreement_pq_vs_exact": agree,
        }
    return report


def main() -> None:
    import argparse
    import os

    import jax

    # CELLVIT_PLATFORM=cpu forces the CPU backend (the axon sitecustomize
    # overrides JAX_PLATFORMS, so this must be a config update — CLAUDE.md)
    if os.environ.get("CELLVIT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CELLVIT_PLATFORM"])
    # persistent compile cache: repeat runs of the same tile size skip the
    # ~minutes-long remote compile on the TPU tunnel
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiles", type=int, default=200)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--levels", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--magnification", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--source", choices=["synthetic", "model"], default="synthetic"
    )
    ap.add_argument("--train-steps", type=int, default=150)
    ap.add_argument("--cells", type=int, default=0,
                    help="nuclei per tile (0 = scale 28·(size/256)²)")
    args = ap.parse_args()
    report = measure_pq_delta(
        n_tiles=args.tiles,
        size=args.size,
        levels_list=tuple(args.levels),
        magnification=args.magnification,
        seed=args.seed,
        source=args.source,
        train_steps=args.train_steps,
        n_cells=args.cells,
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
