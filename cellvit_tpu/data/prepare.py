"""Dataset preparation: original downloads → the fold layout our datasets
(and the reference's, `docs/readmes`) consume.

Reference parity: `cell_segmentation/datasets/prepare_pannuke.py` and
`prepare_monuseg.py` — convert the original PanNuke fold arrays
(images.npy (N,256,256,3), masks.npy (N,256,256,6), types.npy) into
`fold{i}/images/*.png`, `fold{i}/labels/*.npy` ({inst_map, type_map}),
`types.csv` and `cell_count.csv`; MoNuSeg XML annotations → instance-map
npy files.

PanNuke mask channels: 0-4 per-type instance maps (Neoplastic,
Inflammatory, Connective, Dead, Epithelial), 5 background. The combined
instance map renumbers instances globally; the type map assigns channel
index + 1.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List, Union

import numpy as np

PANNUKE_TYPES = ["Neoplastic", "Inflammatory", "Connective", "Dead", "Epithelial"]


def masks_to_inst_type(mask: np.ndarray) -> Dict[str, np.ndarray]:
    """(256, 256, 6) PanNuke mask → {inst_map, type_map} int32."""
    inst = np.zeros(mask.shape[:2], np.int32)
    types = np.zeros(mask.shape[:2], np.int32)
    next_id = 1
    for ch in range(5):
        channel = mask[..., ch].astype(np.int64)
        for inst_id in np.unique(channel):
            if inst_id == 0:
                continue
            sel = channel == inst_id
            inst[sel] = next_id
            types[sel] = ch + 1
            next_id += 1
    return {"inst_map": inst, "type_map": types}


def prepare_pannuke(
    input_path: Union[str, Path],
    output_path: Union[str, Path],
    folds=(0, 1, 2),
) -> None:
    """Original PanNuke layout (`fold{i}/images.npy, masks.npy, types.npy`,
    1-based or 0-based folders both accepted) → consumer layout."""
    from PIL import Image
    import yaml

    input_path, output_path = Path(input_path), Path(output_path)
    tissue_counts: Dict[str, int] = {}
    for fold in folds:
        src = None
        for cand in (
            input_path / f"fold{fold}",
            input_path / f"Fold {fold + 1}",
            input_path / f"fold{fold + 1}",
        ):
            if (cand / "images.npy").exists() or (
                cand / "images" / f"fold{fold + 1}" / "images.npy"
            ).exists():
                src = cand
                break
        if src is None:
            raise FileNotFoundError(f"no source for fold {fold} under {input_path}")

        def find(name: str) -> Path:
            direct = src / name
            if direct.exists():
                return direct
            hits = list(src.rglob(name))
            if not hits:
                raise FileNotFoundError(f"{name} under {src}")
            return hits[0]

        images = np.load(find("images.npy"), mmap_mode="r")
        masks = np.load(find("masks.npy"), mmap_mode="r")
        types = np.load(find("types.npy"))

        out = output_path / f"fold{fold}"
        (out / "images").mkdir(parents=True, exist_ok=True)
        (out / "labels").mkdir(parents=True, exist_ok=True)
        types_rows = [("img", "type")]
        count_rows = [("Image", *PANNUKE_TYPES)]
        for i in range(images.shape[0]):
            name = f"{fold}_{i}"
            Image.fromarray(np.asarray(images[i], np.uint8)).save(
                out / "images" / f"{name}.png"
            )
            label = masks_to_inst_type(np.asarray(masks[i]))
            np.save(
                out / "labels" / f"{name}.npy",
                np.array(label, dtype=object),
                allow_pickle=True,
            )
            tissue = str(types[i])
            tissue_counts[tissue] = tissue_counts.get(tissue, 0) + 1
            types_rows.append((f"{name}.png", tissue))
            counts = [
                len(np.unique(np.asarray(masks[i][..., ch])
                              )) - 1
                for ch in range(5)
            ]
            count_rows.append((f"{name}.png", *map(str, counts)))
        with open(out / "types.csv", "w", newline="") as f:
            csv.writer(f).writerows(types_rows)
        with open(out / "cell_count.csv", "w", newline="") as f:
            csv.writer(f).writerows(count_rows)

    (output_path / "weight_config.yaml").write_text(
        yaml.safe_dump({"tissue": tissue_counts})
    )
    (output_path / "dataset_config.yaml").write_text(
        yaml.safe_dump(
            {
                "tissue_types": {
                    t: i for i, t in enumerate(sorted(tissue_counts))
                },
                "nuclei_types": {
                    "Background": 0,
                    **{t: i + 1 for i, t in enumerate(PANNUKE_TYPES)},
                },
            }
        )
    )


def prepare_monuseg(
    input_path: Union[str, Path], output_path: Union[str, Path]
) -> None:
    """MoNuSeg download (Tissue Images/*.tif + Annotations/*.xml) →
    images/*.png + labels/*.npy instance maps.

    Images and masks are resized 1000→1024 exactly like the reference
    (`prepare_monuseg.py:20-87`: LANCZOS for images, NEAREST for instance
    maps) so the 256/64 patch grid tiles evenly and results stay
    comparable; inputs already at 1024 pass through unchanged."""
    import cv2
    from PIL import Image

    from cellvit_tpu.preprocessing.annotations import load_annotations

    input_path, output_path = Path(input_path), Path(output_path)
    img_dir = next(
        (d for d in (input_path / "Tissue Images", input_path / "images") if d.exists()),
        input_path,
    )
    ann_dir = next(
        (d for d in (input_path / "Annotations", input_path / "labels") if d.exists()),
        input_path,
    )
    (output_path / "images").mkdir(parents=True, exist_ok=True)
    (output_path / "labels").mkdir(parents=True, exist_ok=True)
    for img_path in sorted(img_dir.glob("*.tif")) + sorted(img_dir.glob("*.png")):
        pil = Image.open(img_path).convert("RGB")
        if pil.size != (1024, 1024):
            pil = pil.resize((1024, 1024), resample=Image.Resampling.LANCZOS)
        img = np.array(pil)
        Image.fromarray(img).save(output_path / "images" / f"{img_path.stem}.png")
        xml = ann_dir / f"{img_path.stem}.xml"
        with Image.open(img_path) as orig:
            orig_size = orig.size  # (W, H) — polygons are in this frame
        inst = np.zeros((orig_size[1], orig_size[0]), np.int32)
        if xml.exists():
            polygons, _ = load_annotations(xml)
            for i, poly in enumerate(polygons, start=1):
                cv2.fillPoly(inst, [np.round(poly).astype(np.int32)], i)
        if inst.shape != (1024, 1024):
            inst = np.array(
                Image.fromarray(inst, mode="I").resize(
                    (1024, 1024), resample=Image.Resampling.NEAREST
                ),
                np.int32,
            )
        np.save(
            output_path / "labels" / f"{img_path.stem}.npy",
            np.array(
                {"inst_map": inst, "type_map": (inst > 0).astype(np.int32)},
                dtype=object,
            ),
            allow_pickle=True,
        )


def main() -> None:
    """CLI mirroring the reference's runnable prepare scripts
    (`prepare_pannuke.py` / `prepare_monuseg.py` argparse surfaces)."""
    import argparse

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="Convert original dataset downloads into the fold "
        "layout consumed by cellvit_tpu.data.datasets.",
    )
    sub = parser.add_subparsers(dest="dataset", required=True)
    pk = sub.add_parser("pannuke", description="PanNuke fold arrays → folds")
    pk.add_argument("--input_path", type=str, required=True,
                    help="Folder with fold{0,1,2}/images.npy etc.")
    pk.add_argument("--output_path", type=str, required=True)
    pk.add_argument("--folds", type=int, nargs="+", default=[0, 1, 2])
    mo = sub.add_parser("monuseg", description="MoNuSeg tif+xml → png+npy")
    mo.add_argument("--input_path", type=str, required=True,
                    help="Folder with 'Tissue Images/' and 'Annotations/'")
    mo.add_argument("--output_path", type=str, required=True)
    args = parser.parse_args()
    if args.dataset == "pannuke":
        prepare_pannuke(args.input_path, args.output_path, tuple(args.folds))
    else:
        prepare_monuseg(args.input_path, args.output_path)


if __name__ == "__main__":
    main()
