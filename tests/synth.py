"""Synthetic dataset fixtures in the reference on-disk formats."""

from pathlib import Path

import numpy as np

TISSUES = ["Breast", "Colon", "Lung"]


# nucleus rendering colors keyed by type id: distinct hues make the type
# map learnable, so closed-loop runs (train → checkpoint → eval_pannuke)
# can recover typed PQ / detection F1, not just binary PQ
TYPE_COLORS = np.array(
    [
        [0, 0, 0],      # background (unused)
        [60, 40, 150],  # type 1 (PanNuke: Neoplastic)
        [150, 40, 40],  # type 2 (Inflammatory)
        [40, 120, 60],  # type 3 (Connective)
        [90, 90, 30],   # type 4 (Dead)
        [140, 60, 130], # type 5 (Epithelial)
        [30, 110, 120], # type 6 (CoNIC has 6 foreground classes)
    ],
    np.int32,
)


def random_instance_image(rng, h=64, w=64, n_cells=5, n_types=6):
    """Random blob nuclei → (rgb uint8, inst_map, type_map).

    Background is H&E-like (light pink); nuclei are darker blobs colored
    by their type (TYPE_COLORS + jitter) — separable for both the binary
    and the type heads."""
    img = np.empty((h, w, 3), np.uint8)
    img[..., 0] = rng.integers(200, 236, (h, w))
    img[..., 1] = rng.integers(170, 210, (h, w))
    img[..., 2] = rng.integers(195, 230, (h, w))
    inst = np.zeros((h, w), np.int32)
    types = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    placed = 0
    for _ in range(n_cells * 3):
        if placed >= n_cells:
            break
        cy, cx = rng.integers(8, h - 8), rng.integers(8, w - 8)
        r = int(rng.integers(3, 7))
        sel = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r) & (inst == 0)
        if sel.sum() < 6:
            continue
        placed += 1
        t = int(rng.integers(1, n_types))
        inst[sel] = placed
        types[sel] = t
        color = TYPE_COLORS[t] + rng.integers(-20, 21, 3)
        img[sel] = np.clip(color, 0, 255).astype(np.uint8)
    return img, inst, types


def make_pannuke_dataset(
    root: Path, folds=(0,), n_images=6, seed=0, size=64, n_cells=0
):
    """Write a synthetic dataset in PanNuke layout (pannuke.py contract).

    n_cells=0 scales nucleus density with tile area (5 per 64² patch)."""
    from PIL import Image

    if n_cells <= 0:
        n_cells = max(5, round(5 * (size / 64) ** 2))
    rng = np.random.default_rng(seed)
    root = Path(root)
    tissue_counts = {t: 0 for t in TISSUES}
    for fold in folds:
        (root / f"fold{fold}" / "images").mkdir(parents=True, exist_ok=True)
        (root / f"fold{fold}" / "labels").mkdir(parents=True, exist_ok=True)
        types_rows = ["img,type"]
        count_rows = ["Image,Neoplastic,Inflammatory,Connective,Dead,Epithelial"]
        for i in range(n_images):
            img, inst, typ = random_instance_image(
                rng, h=size, w=size, n_cells=n_cells
            )
            name = f"{fold}_{i}"
            Image.fromarray(img).save(root / f"fold{fold}" / "images" / f"{name}.png")
            np.save(
                root / f"fold{fold}" / "labels" / f"{name}.npy",
                np.array({"inst_map": inst, "type_map": typ}, dtype=object),
                allow_pickle=True,
            )
            tissue = TISSUES[i % len(TISSUES)]
            tissue_counts[tissue] += 1
            types_rows.append(f"{name}.png,{tissue}")
            counts = [
                int(((typ == c) & (inst > 0)).any()) * int(rng.integers(1, 9))
                for c in range(1, 6)
            ]
            count_rows.append(f"{name}.png," + ",".join(map(str, counts)))
        (root / f"fold{fold}" / "types.csv").write_text("\n".join(types_rows) + "\n")
        (root / f"fold{fold}" / "cell_count.csv").write_text(
            "\n".join(count_rows) + "\n"
        )
    import yaml

    (root / "weight_config.yaml").write_text(
        yaml.safe_dump({"tissue": tissue_counts})
    )
    (root / "dataset_config.yaml").write_text(
        yaml.safe_dump(
            {
                "tissue_types": {t: i for i, t in enumerate(TISSUES)},
                "nuclei_types": {
                    "Background": 0,
                    "Neoplastic": 1,
                    "Inflammatory": 2,
                    "Connective": 3,
                    "Dead": 4,
                    "Epithelial": 5,
                },
            }
        )
    )
    return root


def make_conic_dataset(root: Path, folds=(0,), n_images=6, seed=0, size=64):
    """Synthetic dataset in CoNIC layout (conic.py contract): per fold
    images.npy (N, H, W, 3), labels.npy (N, H, W, 2), types.csv,
    cell_count.npy."""
    import yaml

    rng = np.random.default_rng(seed)
    root = Path(root)
    for fold in folds:
        fold_dir = root / f"fold{fold}"
        fold_dir.mkdir(parents=True, exist_ok=True)
        imgs, lbls, counts = [], [], []
        types_rows = ["img,type"]
        for i in range(n_images):
            img, inst, typ = random_instance_image(rng, h=size, w=size, n_types=7)
            imgs.append(img)
            lbls.append(np.stack([inst, typ], axis=-1))
            counts.append(
                [int(((typ == c) & (inst > 0)).any()) for c in range(1, 7)]
            )
            types_rows.append(f"{fold}_{i}.png,colon")
        np.save(fold_dir / "images.npy", np.stack(imgs))
        np.save(fold_dir / "labels.npy", np.stack(lbls))
        np.save(fold_dir / "cell_count.npy", np.array(counts))
        (fold_dir / "types.csv").write_text("\n".join(types_rows) + "\n")
    (root / "dataset_config.yaml").write_text(
        yaml.safe_dump(
            {
                "tissue_types": {"colon": 0},
                "nuclei_types": {
                    "Background": 0, "Neutrophil": 1, "Epithelial": 2,
                    "Lymphocyte": 3, "Plasma": 4, "Eosinophil": 5,
                    "Connective": 6,
                },
            }
        )
    )
    return root
