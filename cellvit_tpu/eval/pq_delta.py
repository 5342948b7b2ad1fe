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
) -> Tuple[np.ndarray, np.ndarray]:
    """GT (inst_map, type_map) with rotated elliptical nuclei.

    Cells are dropped in clusters so a substantial fraction touch — the
    regime where watershed ridge placement actually matters.
    """
    inst = np.zeros((size, size), np.int32)
    types = np.zeros((size, size), np.int32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    placed = 0
    anchors: List[Tuple[float, float]] = []
    for _ in range(n_cells * 4):
        if placed >= n_cells:
            break
        if anchors and rng.random() < 0.55:
            # cluster: drop next to an existing cell so boundaries touch
            ay, ax = anchors[rng.integers(len(anchors))]
            ang = rng.uniform(0, 2 * np.pi)
            d = rng.uniform(8, 14)
            cy, cx = ay + d * np.sin(ang), ax + d * np.cos(ang)
        else:
            cy, cx = rng.uniform(12, size - 12), rng.uniform(12, size - 12)
        if not (8 <= cy < size - 8 and 8 <= cx < size - 8):
            continue
        a = rng.uniform(4.5, 9.0)  # semi-axes
        b = rng.uniform(3.5, a)
        th = rng.uniform(0, np.pi)
        ct, st = np.cos(th), np.sin(th)
        u = (xx - cx) * ct + (yy - cy) * st
        v = -(xx - cx) * st + (yy - cy) * ct
        sel = ((u / a) ** 2 + (v / b) ** 2 <= 1.0) & (inst == 0)
        if sel.sum() < 15:
            continue
        placed += 1
        inst[sel] = placed
        types[sel] = int(rng.integers(1, n_types + 1))
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
    pred_types = np.zeros_like(gt_types)
    for pid in np.unique(pred_inst):
        if pid == 0:
            continue
        sel = pred_inst == pid
        tid = np.bincount(gt_types[sel], minlength=n_types + 1)
        tid[0] = 0
        pred_types[sel] = tid.argmax() if tid.sum() else 0
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
) -> Dict:
    """Run the harness; returns the report dict (see module docstring)."""
    import jax.numpy as jnp

    from cellvit_tpu.ops.hv_postproc import instance_map_batch
    from cellvit_tpu.ops.hv_postproc_np import magnification_params

    object_size, ksize = magnification_params(magnification)
    rng = np.random.default_rng(seed)
    tiles = []
    for _ in range(n_tiles):
        inst, types = make_gt_tile(rng, size=size, n_types=n_types)
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

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiles", type=int, default=200)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--levels", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--magnification", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    report = measure_pq_delta(
        n_tiles=args.tiles,
        size=args.size,
        levels_list=tuple(args.levels),
        magnification=args.magnification,
        seed=args.seed,
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
