"""PQ-delta guard: composed device postproc stays within metric tolerance
of the reference-exact host pipeline (VERDICT r1 item 3).

The full 200-tile measurement lives in `cellvit_tpu/eval/pq_delta.py` and is
recorded in docs/PARITY.md; this test reruns a small slice so regressions in
any approximate op (quantized watershed, windowed size filter, scan CC)
surface as a metric-level failure, not just a per-op diff.
"""

import numpy as np


def test_pq_delta_within_tolerance():
    """Regression guard, not the precision claim: at this sample size the
    paired delta carries ±0.004 sampling noise (measured +0.0012/−0.0026
    across seeds at 24×128²), so the bounds below are set above noise but
    far below what any real algorithm break produces (agreement collapses
    and deltas blow past 0.01). The <0.002 precision claim is the 200-tile
    256² measurement recorded in docs/PARITY.md."""
    from cellvit_tpu.eval.pq_delta import measure_pq_delta

    report = measure_pq_delta(n_tiles=12, size=128, levels_list=(64,), batch=4)
    lv = report["levels"][64]
    # paired delta vs exact pipeline (same tiles, same inputs)
    assert abs(lv["delta_bPQ"]) < 8e-3, report
    assert abs(lv["delta_mPQ"]) < 8e-3, report
    # the two pipelines must produce near-identical instance partitions
    assert lv["agreement_pq_vs_exact"] > 0.98, report
    # and the harness itself must be scoring sane segmentations
    assert report["exact"]["bPQ"] > 0.5, report


def test_pq_delta_dense_tiles_within_tolerance():
    """Production-density regression guard (round 5). At 1024² the GT
    density is ~450 nuclei/tile; the frontier flood needs ~1700 passes
    there, and the old fixed 512-iteration cap silently truncated it —
    ~40% of the foreground stayed unlabeled, a −0.21 bPQ collapse that no
    ≤256² test could see (the first `--size 1024` harness run caught it).
    This runs the same density regime at 512² (~115 nuclei, several
    hundred flood passes) so a reintroduced iteration cap or ramp
    regression fails CI; the recorded 1024² measurements live in
    docs/PARITY.md."""
    from cellvit_tpu.eval.pq_delta import measure_pq_delta

    report = measure_pq_delta(n_tiles=2, size=512, levels_list=(64,), batch=2)
    lv = report["levels"][64]
    assert abs(lv["delta_bPQ"]) < 8e-3, report
    assert lv["agreement_pq_vs_exact"] > 0.97, report
    assert report["exact"]["bPQ"] > 0.5, report


def test_gt_tile_has_touching_cells():
    """The harness only stresses watershed if clusters actually touch."""
    from cellvit_tpu.eval.pq_delta import make_gt_tile

    rng = np.random.default_rng(0)
    inst, types = make_gt_tile(rng, size=256)
    n = inst.max()
    assert n >= 20
    # count instances with a 4-neighbor of a different nonzero label
    touching = 0
    for shift in ((1, 0), (0, 1)):
        a = inst[: inst.shape[0] - shift[0], : inst.shape[1] - shift[1]]
        b = inst[shift[0] :, shift[1] :]
        touching += np.sum((a > 0) & (b > 0) & (a != b))
    assert touching > 20, f"only {touching} touching boundary pixels"
