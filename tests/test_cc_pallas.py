"""Pallas CC/flood kernel tests (interpret mode vs scipy)."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from cellvit_tpu.ops.cc_pallas import (
    connected_components_pallas,
    fill_holes_pallas,
)


def _roots_to_scipy_order(lab: np.ndarray) -> np.ndarray:
    """Root labels → consecutive ids in raster order (for comparison)."""
    out = np.zeros_like(lab)
    next_id = 1
    seen = {}
    for v in lab.ravel():
        if v == 0 or v in seen:
            continue
        seen[v] = next_id
        next_id += 1
    for v, nid in seen.items():
        out[lab == v] = nid
    return out


def test_cc_pallas_blobs(rng):
    masks = np.zeros((2, 64, 64), bool)
    yy, xx = np.mgrid[0:64, 0:64]
    for b in range(2):
        for _ in range(6):
            cy, cx = rng.integers(8, 56, 2)
            r = rng.integers(3, 7)
            masks[b] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    out = np.asarray(
        connected_components_pallas(jnp.asarray(masks), interpret=True)
    )
    for b in range(2):
        ref, _ = ndimage.label(masks[b])
        np.testing.assert_array_equal(_roots_to_scipy_order(out[b]), ref)


def test_cc_pallas_l_shape():
    """L/U shaped components need the multi-direction outer iterations."""
    m = np.zeros((1, 32, 32), bool)
    m[0, 5:25, 5:8] = True
    m[0, 22:25, 5:25] = True
    m[0, 5:25, 22:25] = True  # U-shape
    out = np.asarray(connected_components_pallas(jnp.asarray(m), interpret=True))
    ref, _ = ndimage.label(m[0])
    np.testing.assert_array_equal(_roots_to_scipy_order(out[0]), ref)


def test_fill_holes_pallas():
    m = np.zeros((1, 32, 32), bool)
    m[0, 5:20, 5:20] = True
    m[0, 8:15, 8:15] = False
    out = np.asarray(fill_holes_pallas(jnp.asarray(m), interpret=True))
    ref = ndimage.binary_fill_holes(m[0])
    np.testing.assert_array_equal(out[0], ref)


def test_remove_small_objects_bincount_pallas_matches_window(rng):
    """VMEM radix-histogram size filter (the production TPU path for the
    marker call) ≡ windowed equality counting on compacted labels."""
    from cellvit_tpu.ops import cc
    from cellvit_tpu.ops.cc_pallas import remove_small_objects_bincount_pallas

    B, H, W = 2, 128, 256
    yy, xx = np.mgrid[0:H, 0:W]
    m = np.zeros((B, H, W), bool)
    for b in range(B):
        for _ in range(80):
            cy, cx = rng.integers(3, H - 3), rng.integers(3, W - 3)
            m[b] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= rng.integers(1, 6) ** 2
    lab = np.stack([
        np.asarray(cc.connected_components(jnp.asarray(mb)))  # compacted
        for mb in m
    ])
    for ms in (3, 10):
        want = np.stack([
            np.asarray(cc.remove_small_objects_window(jnp.asarray(l), ms))
            for l in lab
        ])
        got = np.asarray(remove_small_objects_bincount_pallas(
            jnp.asarray(lab), ms, interpret=True
        ))
        np.testing.assert_array_equal(got, want, err_msg=f"min_size={ms}")


def test_watershed_pallas_matches_xla(rng):
    from cellvit_tpu.ops.cc_pallas import watershed_pallas
    from cellvit_tpu.ops.watershed import watershed

    B, H, W = 2, 96, 128
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros((B, H, W), np.float32)
    mark = np.zeros((B, H, W), np.int32)
    mask = np.zeros((B, H, W), bool)
    for b in range(B):
        k = 1
        for _ in range(8):
            cy = rng.integers(12, H - 12)
            cx = rng.integers(12, W - 12)
            r = rng.integers(5, 11)
            sel = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            mask[b] |= sel
            img[b] = np.minimum(
                img[b], -np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (r * r))
            )
            mark[b][cy, cx] = k
            k += 1
    want = np.stack([
        np.asarray(watershed(jnp.asarray(img[b]), jnp.asarray(mark[b]),
                             jnp.asarray(mask[b]), schedule="sweep"))
        for b in range(B)
    ])
    got = np.asarray(watershed_pallas(
        jnp.asarray(img), jnp.asarray(mark), jnp.asarray(mask),
        interpret=True,
    ))
    np.testing.assert_array_equal(got, want)


def test_compact_root_labels_pallas_matches_gather(rng):
    """Rank-propagation compaction must reproduce the gather formulation
    (and scipy raster numbering) exactly, including U/ring shapes that
    need the full n_outer propagation depth."""
    import jax

    from cellvit_tpu.ops import cc
    from cellvit_tpu.ops.cc_pallas import compact_root_labels_pallas

    m = np.zeros((2, 64, 64), bool)
    yy, xx = np.mgrid[0:64, 0:64]
    for b in range(2):
        for _ in range(25):
            cy, cx = rng.integers(4, 60, 2)
            r = int(rng.integers(2, 5))
            m[b] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    # U shape and ring: worst-case propagation turns
    m[0, 10:30, 10:12] = True
    m[0, 28:30, 10:30] = True
    m[0, 10:30, 28:30] = True
    m[1, 40:60, 40:42] = True
    m[1, 40:42, 40:60] = True
    m[1, 58:60, 40:60] = True
    m[1, 40:60, 58:60] = True

    lab = connected_components_pallas(jnp.asarray(m), n_outer=3, interpret=True)
    got = np.asarray(compact_root_labels_pallas(lab, n_outer=3, interpret=True))
    want = np.asarray(jax.vmap(cc.compact_root_labels)(lab))
    np.testing.assert_array_equal(got, want)
    for b in range(2):
        ref, _ = ndimage.label(
            m[b], structure=[[0, 1, 0], [1, 1, 1], [0, 1, 0]]
        )
        np.testing.assert_array_equal(got[b], ref)


def test_remove_small_objects_pallas_matches_window(rng):
    """VMEM windowed-count kernel ≡ the XLA shifted-compare formulation on
    a noisy many-component mask (both implement the exact L∞-window
    criterion of cc.remove_small_objects_window)."""
    import jax

    from cellvit_tpu.ops import cc
    from cellvit_tpu.ops.cc_pallas import (
        compact_root_labels_pallas,
        remove_small_objects_pallas,
    )

    m = rng.random((2, 96, 128)) < 0.35
    lab = connected_components_pallas(jnp.asarray(m), n_outer=4, interpret=True)
    lab = compact_root_labels_pallas(lab, n_outer=4, interpret=True)
    for ms in (3, 10):
        got = np.asarray(
            remove_small_objects_pallas(lab, ms, interpret=True)
        )
        want = np.asarray(
            jax.vmap(lambda x: cc.remove_small_objects_window(x, ms))(lab)
        )
        np.testing.assert_array_equal(got, want)
