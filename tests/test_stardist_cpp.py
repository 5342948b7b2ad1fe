"""StarDist/CPP-Net model, NMS postprocessing, and converter tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cellvit_tpu.models.cpp_net import CellViTCPP
from cellvit_tpu.models.stardist import CellViTStarDist
from cellvit_tpu.ops import stardist_nms as sd


def tiny_stardist(**kw):
    cfg = dict(
        num_nuclei_classes=6, num_tissue_classes=5, embed_dim=32, depth=4,
        num_heads=2, extract_layers=(1, 2, 3, 4), encoder_type="histo",
        nrays=8,
    )
    cfg.update(kw)
    return CellViTStarDist(**cfg)


def tiny_cpp(**kw):
    cfg = dict(
        num_nuclei_classes=6, num_tissue_classes=5, embed_dim=32, depth=4,
        num_heads=2, extract_layers=(1, 2, 3, 4), encoder_type="histo",
        nrays=8,
    )
    cfg.update(kw)
    return CellViTCPP(**cfg)


def test_stardist_forward_shapes():
    model = tiny_stardist()
    x = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["stardist_map"].shape == (2, 64, 64, 8)
    assert float(out["stardist_map"].min()) >= 0.0  # ReLU
    assert out["dist_map"].shape == (2, 64, 64, 1)
    assert out["nuclei_type_map"].shape == (2, 64, 64, 6)
    assert out["tissue_types"].shape == (2, 5)


def test_cpp_forward_shapes():
    model = tiny_cpp()
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["stardist_map"].shape == (1, 64, 64, 8)
    assert out["stardist_map_refined"].shape == (1, 64, 64, 8)
    assert float(out["stardist_map_refined"].min()) >= 0.0
    assert out["dist_map"].shape == (1, 64, 64, 1)


def test_ray_sampling_matches_torch_grid_sample(rng):
    from cellvit_tpu.ops.ray_sampling import ray_angles, sample_rays

    b, h, w, k = 2, 16, 16, 4
    feats = rng.standard_normal((b, h, w, k), dtype=np.float32)
    dist = (rng.random((b, h, w, k)) * 6).astype(np.float32)

    # torch reference chain (cellvit_cpp_net.py feature_sampling semantics)
    angles = torch.from_numpy(ray_angles(k))
    sin = torch.sin(angles).view(1, k, 1, 1)
    cos = torch.cos(angles).view(1, k, 1, 1)
    dist_t = torch.from_numpy(dist.transpose(0, 3, 1, 2))
    feat_t = torch.from_numpy(feats.transpose(0, 3, 1, 2))
    off_y = sin * dist_t
    off_x = cos * dist_t
    x_ = torch.arange(w).view(1, -1).expand(h, -1).float()
    y_ = torch.arange(h).view(-1, 1).expand(-1, w).float()
    px = (off_x + x_) / (w - 1) * 2 - 1
    py = (off_y + y_) / (h - 1) * 2 - 1
    grid = torch.stack([px, py], dim=-1)  # (B, k, H, W, 2)
    grid = grid.permute(1, 0, 2, 3, 4).flatten(0, 1)  # (kB, H, W, 2)
    inp = feat_t.permute(1, 0, 2, 3).reshape(k * b, 1, h, w)
    ref = F.grid_sample(inp, grid, mode="nearest", align_corners=False)
    ref = ref.view(k, b, h, w).permute(1, 2, 3, 0).numpy()

    out = np.asarray(sample_rays(jnp.asarray(feats), jnp.asarray(dist)))
    match = np.isclose(out, ref, atol=1e-5).mean()
    assert match > 0.99, f"agreement {match}"  # ties in nearest rounding


def test_stardist_roundtrip_checkpoint():
    from cellvit_tpu.models.checkpoint_io import (
        convert_state_dict,
        export_torch_state_dict,
    )

    model = tiny_cpp()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    sd_t = export_torch_state_dict(variables, sam_encoder=False)
    assert "stardist_head.weight" in sd_t
    assert "conv_1_confidence.weight" in sd_t
    assert sd_t["conv_1_confidence.weight"].shape == (6, 6, 1, 1)
    back = convert_state_dict(sd_t, sam_encoder=False)
    out_a = model.apply(variables, x, train=False)
    out_b = model.apply(back, x, train=False)
    for key in out_a:
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]), atol=1e-6
        )


def _star_maps(rng, h=64, w=64, centers=((20, 20), (40, 44)), r=8, n_rays=16):
    dist_map = np.zeros((h, w), np.float32)
    star = np.zeros((h, w, n_rays), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for cy, cx in centers:
        inside = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        dist_map[inside] = np.maximum(dist_map[inside], 1.0 - d[inside] / r)
        star[inside] = np.maximum(star[inside], (r - d[inside])[..., None])
    return dist_map, star


def test_nms_keeps_separate_cells(rng):
    dist_map, star = _star_maps(rng)
    points, probs, dists = sd.non_maximum_suppression(star, dist_map)
    assert len(points) == 2
    got = {tuple(p) for p in points}
    assert got == {(20, 20), (40, 44)}


def test_nms_suppresses_duplicates(rng):
    # two heavily overlapping candidates: only one survives
    dist_map, star = _star_maps(rng, centers=((30, 30), (31, 31)))
    points, _, _ = sd.non_maximum_suppression(star, dist_map)
    assert len(points) == 1


def test_polygons_to_label_and_postproc(rng):
    dist_map, star = _star_maps(rng)
    proc = sd.StarDistPostProcessor(nr_types=6, image_shape=dist_map.shape)
    type_prob = np.zeros((*dist_map.shape, 6), np.float32)
    type_prob[..., 0] = 1.0
    type_prob[dist_map > 0] = 0
    type_prob[dist_map > 0, 2] = 1.0
    inst, info, type_map = proc.post_proc_stardist(dist_map, star, type_prob)
    assert inst.max() == 2
    assert len(info) == 2
    for spec in info.values():
        assert spec["type"] == 2
        assert spec["contour"].shape[1] == 2
    assert type_map.shape == (*dist_map.shape, 6)
    assert (type_map[..., 2] > 0).any()


def test_nms_device_candidates_match_host(rng):
    """Device top-k candidate stage reproduces the host NMS exactly."""
    import jax.numpy as jnp

    from cellvit_tpu.ops.stardist_nms import (
        nms_candidates_device,
        non_maximum_suppression,
    )

    h = w = 128
    prob = np.zeros((h, w), np.float32)
    dist = np.full((h, w, 32), 1.0, np.float32)
    for _ in range(25):
        cy, cx = rng.integers(10, h - 10, 2)
        prob[cy, cx] = rng.uniform(0.6, 0.99)
        dist[cy, cx] = rng.uniform(3, 9)
    # duplicate probability to exercise tie stability
    prob[20, 20] = prob[40, 40] = 0.77
    dist[20, 20] = 5.0
    dist[40, 40] = 5.0

    p_host, pr_host, d_host = non_maximum_suppression(dist, prob)
    cand = nms_candidates_device(jnp.asarray(prob), jnp.asarray(dist))
    p_dev, pr_dev, d_dev = non_maximum_suppression(None, None, candidates=cand)
    np.testing.assert_array_equal(p_host, p_dev)
    np.testing.assert_allclose(pr_host, pr_dev, rtol=1e-6)
    np.testing.assert_allclose(d_host, d_dev, rtol=1e-6)


def test_post_proc_stardist_accepts_device_arrays(rng):
    import jax.numpy as jnp

    from cellvit_tpu.ops.stardist_nms import StarDistPostProcessor

    h = w = 96
    prob = np.zeros((h, w), np.float32)
    dist = np.full((h, w, 32), 1.0, np.float32)
    for cy, cx in [(20, 20), (60, 70), (80, 30)]:
        prob[cy, cx] = 0.9
        dist[cy, cx] = 8.0
    tp = np.zeros((h, w, 4), np.float32)
    tp[..., 1] = 1.0
    proc = StarDistPostProcessor(nr_types=4, image_shape=(h, w))
    inst_np, info_np, _ = proc.post_proc_stardist(prob, dist, tp)
    inst_j, info_j, _ = proc.post_proc_stardist(
        jnp.asarray(prob), jnp.asarray(dist), jnp.asarray(tp)
    )
    np.testing.assert_array_equal(inst_np, inst_j)
    assert set(info_np) == set(info_j)
