"""On-device op tests against cv2/scipy oracles and the numpy HV oracle."""

import cv2
import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from cellvit_tpu.ops import cc, filters
from cellvit_tpu.ops import hv_postproc_np as oracle


def test_sobel_kernels_match_cv2():
    for k in (3, 5, 11, 21):
        deriv, smooth = filters.sobel_kernels_1d(k)
        kx, ky = cv2.getDerivKernels(1, 0, k)
        np.testing.assert_allclose(deriv, kx.ravel(), err_msg=f"deriv k={k}")
        np.testing.assert_allclose(smooth, ky.ravel(), err_msg=f"smooth k={k}")


@pytest.mark.parametrize("ksize", [11, 21])
def test_sobel_filter_matches_cv2(rng, ksize):
    x = rng.random((64, 64)).astype(np.float32)
    ref_h = cv2.Sobel(x, cv2.CV_64F, 1, 0, ksize=ksize)
    ref_v = cv2.Sobel(x, cv2.CV_64F, 0, 1, ksize=ksize)
    out_h = np.asarray(filters.sobel(jnp.asarray(x), 1, 0, ksize))
    out_v = np.asarray(filters.sobel(jnp.asarray(x), 0, 1, ksize))
    # kernels carry huge integer coefficients (≤184756 at k=21) so compare
    # relative to the output range (f32 accumulation, ~1e-6 relative)
    scale_h, scale_v = np.abs(ref_h).max(), np.abs(ref_v).max()
    np.testing.assert_allclose(out_h / scale_h, ref_h / scale_h, atol=2e-6)
    np.testing.assert_allclose(out_v / scale_v, ref_v / scale_v, atol=2e-6)


def test_gaussian_blur_matches_cv2(rng):
    x = rng.random((32, 48)).astype(np.float32)
    ref = cv2.GaussianBlur(x, (3, 3), 0)
    out = np.asarray(filters.gaussian_blur_3x3(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_connected_components_matches_scipy(rng):
    mask = rng.random((48, 48)) > 0.7
    ref, _ = ndimage.label(mask)
    out = np.asarray(cc.connected_components(jnp.asarray(mask)))
    np.testing.assert_array_equal(out, ref)


def test_connected_components_spiral():
    """Long snaking component exercises pointer-jump convergence."""
    m = np.zeros((32, 32), bool)
    m[0, :] = True
    m[:, -1] = True
    m[-1, :] = True
    m[2:, 0] = True
    m[2, 0:29] = True
    ref, _ = ndimage.label(m)
    out = np.asarray(cc.connected_components(jnp.asarray(m)))
    np.testing.assert_array_equal(out, ref)


def test_remove_small_objects(rng):
    mask = rng.random((48, 48)) > 0.8
    lab = cc.connected_components(jnp.asarray(mask))
    out = np.asarray(cc.remove_small_objects(lab, 5, 48 * 48 // 2 + 2))
    ref = oracle.remove_small_objects(ndimage.label(mask)[0], 5)
    np.testing.assert_array_equal(out > 0, ref > 0)


def test_remove_small_objects_bincount_matches_window(rng):
    """MXU radix-histogram size filter (production TPU path) ≡ the windowed
    equality count on compacted labels; overflow ids degrade by KEEPING."""
    mask = rng.random((96, 96)) > 0.75
    lab = cc.connected_components(jnp.asarray(mask))  # compact ids
    for ms in (3, 10):
        want = np.asarray(cc.remove_small_objects_window(lab, ms))
        got = np.asarray(cc.remove_small_objects_bincount(lab, ms))
        np.testing.assert_array_equal(got, want)
    # overflow: ids >= max_labels are kept, never removed in error
    lab2 = np.zeros((32, 32), np.int32)
    lab2[0, 0:3] = 9000  # 3-px component beyond the 8192-id radix
    lab2[10, 10:30] = 5
    lab2[20, 20] = 7
    got = np.asarray(cc.remove_small_objects_bincount(jnp.asarray(lab2), 10))
    assert (got[0, 0:3] == 9000).all()
    assert (got[10, 10:30] == 5).all()
    assert got[20, 20] == 0


def test_fill_holes():
    m = np.zeros((32, 32), bool)
    m[5:20, 5:20] = True
    m[8:15, 8:15] = False  # hole
    m[25:30, 0:4] = True  # open at border — not a hole interior anyway
    ref = ndimage.binary_fill_holes(m)
    out = np.asarray(cc.fill_holes(jnp.asarray(m)))
    np.testing.assert_array_equal(out, ref)


def test_ellipse_se_matches_cv2():
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5)).astype(bool)
    np.testing.assert_array_equal(cc.ELLIPSE_5, ref)


def test_morph_open_matches_cv2(rng):
    mask = (rng.random((48, 48)) > 0.55).astype(np.uint8)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    ref = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel).astype(bool)
    out = np.asarray(cc.morph_open(jnp.asarray(mask > 0)))
    np.testing.assert_array_equal(out, ref)


def _synthetic_cells(rng, h=96, w=96, n=6):
    """Synthetic NP/HV maps for a few blob nuclei (the HoverNet map model:
    HV = per-nucleus centered ±1 gradients)."""
    np_prob = np.zeros((h, w), np.float32)
    hv = np.zeros((h, w, 2), np.float32)
    centers = []
    for _ in range(n):
        cy, cx = rng.integers(12, h - 12), rng.integers(12, w - 12)
        r = rng.integers(5, 9)
        centers.append((cy, cx, r))
    yy, xx = np.mgrid[0:h, 0:w]
    for cy, cx, r in centers:
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        inside = d2 <= r * r
        np_prob[inside] = 0.95
        hv[inside, 0] = ((xx - cx) / r)[inside]
        hv[inside, 1] = ((yy - cy) / r)[inside]
    return np_prob, hv


def test_hv_pipeline_device_vs_oracle(rng):
    from cellvit_tpu.ops.hv_postproc import instance_map_batch

    np_prob, hv = _synthetic_cells(rng)
    ref = oracle.proc_np_hv(np_prob, hv, object_size=10, ksize=21)
    out = np.asarray(
        instance_map_batch(jnp.asarray(np_prob)[None], jnp.asarray(hv)[None])
    )[0]
    # same foreground support
    agree = (ref > 0) == (out > 0)
    assert agree.mean() > 0.995, f"fg agreement {agree.mean()}"
    # same number of instances
    assert len(np.unique(ref)) == len(np.unique(out))
    # pixel-level label agreement up to renumbering: match via majority map
    matched = 0
    total = (ref > 0).sum()
    for rid in np.unique(ref)[1:]:
        sel = ref == rid
        oid = np.bincount(out[sel]).argmax()
        matched += (out[sel] == oid).sum()
    assert matched / max(total, 1) > 0.98, f"instance agreement {matched / total}"


def test_watershed_frontier_matches_sweep_and_oracle(rng):
    """The frontier schedule (dynamic level skipping, the production
    default) must agree with the fixed sweep and the exact heap flood on
    point-seeded basins — the regime where flood ORDER matters most."""
    from cellvit_tpu.ops.watershed import watershed

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w), np.float32)
    mark = np.zeros((h, w), np.int32)
    mask = np.zeros((h, w), bool)
    for k in range(1, 11):
        cy, cx = rng.integers(12, h - 12), rng.integers(12, w - 12)
        r = rng.integers(5, 11)
        sel = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        mask |= sel
        img = np.minimum(img, -np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (r * r)))
        mark[cy, cx] = k
    args = (jnp.asarray(img), jnp.asarray(mark), jnp.asarray(mask))
    front = np.asarray(watershed(*args, schedule="frontier"))
    sweep = np.asarray(watershed(*args, schedule="sweep"))
    exact = oracle.watershed(img, mark, mask)
    assert ((front > 0) == mask).all(), "frontier must label every masked px"
    np.testing.assert_array_equal(front, sweep)
    assert (front[mask] == exact[mask]).mean() > 0.97


def test_oracle_watershed_separates_touching_cells():
    """Two touching blobs with HV ridges must split into two instances."""
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    np_prob = np.zeros((h, w), np.float32)
    hv = np.zeros((h, w, 2), np.float32)
    for cy, cx in ((32, 24), (32, 40)):
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        inside = d2 <= 100
        np_prob[inside] = 0.9
        hv[inside, 0] = ((xx - cx) / 10.0)[inside]
        hv[inside, 1] = ((yy - cy) / 10.0)[inside]
    inst = oracle.proc_np_hv(np_prob, hv)
    assert inst.max() == 2
