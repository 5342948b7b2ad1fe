"""PQ metric suite and instance-stats tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from cellvit_tpu.eval import metrics


def _random_instances(rng, h=64, w=64, n=5):
    m = np.zeros((h, w), np.int32)
    for i in range(1, n + 1):
        cy, cx = rng.integers(8, h - 8), rng.integers(8, w - 8)
        r = rng.integers(3, 7)
        yy, xx = np.mgrid[0:h, 0:w]
        sel = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r) & (m == 0)
        m[sel] = i
    return metrics.remap_label(m)


def _reference_pq(true, pred, match_iou=0.5):
    """Direct O(N²) mask-loop PQ (independent re-derivation of the published
    PanNuke-metrics definition) as oracle for the vectorized version."""
    tids = [i for i in np.unique(true) if i != 0]
    pids = [i for i in np.unique(pred) if i != 0]
    iou = np.zeros((len(tids), len(pids)))
    for a, t in enumerate(tids):
        tm = true == t
        for b, p in enumerate(pids):
            pm = pred == p
            inter = (tm & pm).sum()
            if inter == 0:
                continue
            iou[a, b] = inter / (tm | pm).sum()
    matched = iou > match_iou
    tp = matched.sum()
    fp = len(pids) - matched.any(axis=0).sum()
    fn = len(tids) - matched.any(axis=1).sum()
    dq = tp / (tp + 0.5 * fp + 0.5 * fn + 1e-6)
    sq = iou[matched].sum() / (tp + 1e-6)
    return dq, sq, dq * sq


def test_pq_perfect_match(rng):
    m = _random_instances(rng)
    [dq, sq, pq], _ = metrics.get_fast_pq(m, m)
    assert dq == pytest.approx(1.0, abs=1e-5)
    assert sq == pytest.approx(1.0, abs=1e-5)
    assert pq == pytest.approx(1.0, abs=1e-5)


def test_pq_matches_mask_loop_oracle(rng):
    true = _random_instances(rng, n=6)
    pred = _random_instances(np.random.default_rng(1), n=5)
    [dq, sq, pq], _ = metrics.get_fast_pq(true, pred)
    rdq, rsq, rpq = _reference_pq(true, pred)
    assert dq == pytest.approx(rdq, abs=1e-9)
    assert sq == pytest.approx(rsq, abs=1e-9)
    assert pq == pytest.approx(rpq, abs=1e-9)


def test_pq_shifted_prediction(rng):
    true = _random_instances(rng, n=4)
    pred = np.roll(true, 2, axis=0)
    pred = metrics.remap_label(pred)
    [dq, sq, pq], _ = metrics.get_fast_pq(true, pred)
    rdq, rsq, rpq = _reference_pq(true, pred)
    assert pq == pytest.approx(rpq, abs=1e-9)


def test_remap_label():
    m = np.array([[0, 3, 3], [7, 7, 0]])
    out = metrics.remap_label(m)
    assert set(np.unique(out)) == {0, 1, 2}
    assert (out[m == 3] == 1).all() and (out[m == 7] == 2).all()


def test_pair_coordinates():
    a = np.array([[0.0, 0.0], [10.0, 10.0], [40.0, 40.0]])
    b = np.array([[1.0, 1.0], [30.0, 30.0]])
    paired, ua, ub = metrics.pair_coordinates(a, b, radius=5)
    assert paired.tolist() == [[0, 0]]
    assert ua.tolist() == [1, 2] and ub.tolist() == [1]


def test_detection_scores():
    f1, prec, rec = metrics.cell_detection_scores(
        np.array([1, 2]), np.array([1, 1]), np.array([3]), np.array([])
    )
    assert prec == 1.0
    assert rec == pytest.approx(2 / 3)


def test_instance_stats_matches_numpy(rng):
    from cellvit_tpu.ops.instance_stats import instance_stats_batch, relabel_consecutive

    m = _random_instances(rng, n=4)
    types = (m > 0).astype(np.int32) * rng.integers(1, 5, m.shape)
    stats = instance_stats_batch(
        jnp.asarray(m)[None], jnp.asarray(types)[None],
        max_instances=16, num_classes=6,
    )
    for i in np.unique(m)[1:]:
        sel = m == i
        ys, xs = np.nonzero(sel)
        k = i - 1
        assert bool(stats["valid"][0, k])
        assert int(stats["area"][0, k]) == sel.sum()
        np.testing.assert_allclose(
            np.asarray(stats["centroid"][0, k]), [xs.mean(), ys.mean()], atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(stats["bbox"][0, k]),
            [ys.min(), ys.max() + 1, xs.min(), xs.max() + 1],
        )
        vals, counts = np.unique(types[sel], return_counts=True)
        expect_type = vals[np.argmax(counts)]
        if expect_type == 0 and len(vals) > 1:
            expect_type = vals[np.argsort(-counts)][1]
        assert int(stats["type"][0, k]) == expect_type
    # slots beyond N invalid
    n = int(m.max())
    assert not np.asarray(stats["valid"][0, n:]).any()


def test_relabel_consecutive():
    from cellvit_tpu.ops.instance_stats import relabel_consecutive

    m = jnp.asarray(np.array([[0, 5, 5], [9, 0, 2]], np.int32))
    out = np.asarray(relabel_consecutive(m, 16))
    assert set(out.ravel().tolist()) == {0, 1, 2, 3}
    # order-preserving: 2 < 5 < 9
    assert out[1, 2] == 1 and out[0, 1] == 2 and out[1, 0] == 3


def test_contours_roundtrip(rng):
    from cellvit_tpu.ops.instance_stats import contours_from_instance_map

    m = _random_instances(rng, n=3)
    contours = contours_from_instance_map(m)
    assert set(contours) == set(np.unique(m)[1:].tolist())
    for cid, cnt in contours.items():
        assert cnt.ndim == 2 and cnt.shape[1] == 2
        # contour points lie on the instance
        ys, xs = cnt[:, 1], cnt[:, 0]
        assert (m[ys, xs] == cid).all()
