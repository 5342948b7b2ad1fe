"""WSI → patch-dataset extraction pipeline.

Equivalent of the reference PreProcessor
(`preprocessing/patch_extraction/src/patch_extraction.py:307-972` +
`src/storage.py`): per slide, select the pyramid level for the requested
target_mpp/magnification/downsample, build a thumbnail tissue mask (Otsu,
optional pen-marker prefilter), keep grid patches above the tissue
intersection ratio (`compute_interesting_patches`, patch_util.py:288-525),
extract the overlapping tiles through the native libtiff reader with a
thread pool (one reader handle per worker — replaces the CuCIM/queue-worker
design), optional Macenko normalization, and write the storage tree:

    <out>/<wsi_name>/patches/*.png
                     metadata/*.yaml       (per-patch row/col/background)
                     thumbnails/…          tissue_masks/…
                     patch_metadata.json   metadata.yaml

`processed.json` at the output root provides resume (reference
patch_extraction.py:486-524). The tiling math is DeepZoom-compatible:
tile_size = patch_size − 2·overlap, region origin = col·tile_size − overlap
(patch_util.py:86-110), uniform patch_size reads with white border padding.
"""

from __future__ import annotations

import json
import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import yaml

from cellvit_tpu.preprocessing import masking
from cellvit_tpu.preprocessing.macenko import macenko_normalization
from cellvit_tpu.preprocessing.wsi_reader import open_slide
from cellvit_tpu.utils.logger import Logger


@dataclass
class PreProcessingConfig:
    """Preprocessing configuration — full reference YAML schema
    (`src/cli.py:28-230`, PreProcessingConfig pydantic model). Field names
    match the reference so its preprocessing configs load unchanged."""

    output_path: str
    wsi_paths: Optional[Union[str, Sequence[str]]] = None
    wsi_filelist: Optional[str] = None  # csv: path[,slide_mpp,magnification]
    wsi_extension: str = "svs"
    # tiling / level selection
    patch_size: int = 256
    patch_overlap: float = 0.0  # percentage of patch_size (reference semantics)
    target_mpp: Optional[float] = None
    target_mag: Optional[float] = None
    downsample: int = 1
    level: Optional[int] = None  # direct pyramid level (overrides downsample)
    context_scales: Optional[Sequence[int]] = None  # e.g. [2, 4]
    check_resolution: Optional[float] = None  # assert slide magnification
    processes: int = 8
    overwrite: bool = False
    # annotations
    annotation_paths: Optional[str] = None
    annotation_extension: str = "geojson"
    incomplete_annotations: bool = False  # allow WSI without annotation file
    label_map_file: Optional[str] = None  # json {label: int}
    label_map: Dict[str, int] = field(default_factory=lambda: {"background": 0})
    save_only_annotated_patches: bool = False
    exclude_classes: Sequence[str] = ()
    store_masks: bool = False
    generate_thumbnails: bool = False  # extra downsampled overview PNGs
    overlapping_labels: bool = False  # per-label mask channels instead of priority
    # stains / brightness
    normalize_stains: bool = False
    normalization_vector_json: Optional[str] = None
    adjust_brightness: bool = False  # legacy joint 90th-pct brightness clip
    # tissue masking
    min_intersection_ratio: float = 0.01
    tissue_annotation: Optional[str] = None  # strict named tissue polygon
    tissue_annotation_intersection_ratio: Optional[float] = None
    masked_otsu: bool = False  # mask thumbnail with otsu_annotation before Otsu
    otsu_annotation: Optional[str] = None  # non-strict mask-polygon name
    filter_patches: bool = False  # post-extraction DL tissue filter
    filter_model_path: Optional[str] = None  # TissueClassifier weights
    apply_prefilter: bool = False
    # logging / hardware
    log_path: Optional[str] = None
    log_level: str = "info"
    hardware_selection: str = "native"  # accepted for YAML-compat; the
    # native libtiff reader is always used (reference: cucim|openslide)
    wsi_properties: Dict = field(default_factory=dict)
    # per-patch label-intersection threshold + deprecated mask-store alias
    min_intersection_ratio_annotation: float = 0.0
    incl_annotation_masks: bool = False

    def __post_init__(self):
        assert 0 <= self.patch_overlap < 100
        assert 0 <= self.min_intersection_ratio <= 1
        assert self.patch_size > 0 and self.processes >= 1
        if self.incl_annotation_masks:  # deprecated alias
            self.store_masks = True
        if self.wsi_paths is None and self.wsi_filelist is None:
            raise ValueError("one of wsi_paths / wsi_filelist is required")
        if self.label_map_file is not None:
            self.label_map = {
                str(k): int(v)
                for k, v in json.loads(Path(self.label_map_file).read_text()).items()
            }


def patch_to_tile_size(patch_size: int, overlap_px: int) -> int:
    """DeepZoom tile size from patch size (patch_util.py:86-110)."""
    return patch_size - 2 * overlap_px


class PreProcessor:
    def __init__(self, slide_processor_config: PreProcessingConfig) -> None:
        self.config = slide_processor_config
        self.output = Path(self.config.output_path)
        self.output.mkdir(parents=True, exist_ok=True)
        log_dir = Path(self.config.log_path) if self.config.log_path else self.output
        self.logger = Logger(
            level=self.config.log_level.upper(), log_dir=log_dir
        ).create_logger()

        # per-file metadata overrides (filelist csv columns, cli.py:88)
        self.file_properties: Dict[str, Dict] = {}
        if self.config.wsi_filelist is not None:
            import csv

            self.files = []
            with open(self.config.wsi_filelist, newline="") as fh:
                for rec in csv.DictReader(fh):
                    path = Path(rec.get("path") or next(iter(rec.values())))
                    self.files.append(path)
                    props = {}
                    if rec.get("slide_mpp"):
                        props["slide_mpp"] = float(rec["slide_mpp"])
                    if rec.get("magnification"):
                        props["magnification"] = float(rec["magnification"])
                    if props:
                        self.file_properties[path.name] = props
        else:
            wsi_paths = self.config.wsi_paths
            if isinstance(wsi_paths, (str, Path)) and Path(wsi_paths).is_dir():
                self.files = sorted(
                    Path(wsi_paths).glob(f"*.{self.config.wsi_extension}")
                )
            elif isinstance(wsi_paths, (str, Path)):
                self.files = [Path(wsi_paths)]
            else:
                self.files = [Path(p) for p in wsi_paths]

        # per-side overlap pixels (reference patch_extraction.py:144-146:
        # floor(patch_size/2 · percent/100)); metadata records 2× this
        overlap_px = int(
            math.floor(
                self.config.patch_size / 2 * self.config.patch_overlap / 100
            )
        )
        self.overlap_px = overlap_px
        self.tile_size = patch_to_tile_size(self.config.patch_size, overlap_px)

    # ----------------------------------------------------------- resume

    def _processed_path(self) -> Path:
        return self.output / "processed.json"

    def _load_processed(self) -> List[str]:
        if self._processed_path().exists():
            return json.loads(self._processed_path().read_text())["processed_files"]
        return []

    def _mark_processed(self, name: str) -> None:
        done = self._load_processed()
        if name not in done:
            done.append(name)
        self._processed_path().write_text(
            json.dumps({"processed_files": done}, indent=2)
        )

    # ----------------------------------------------------------- levels

    def _wsi_properties(self, wsi_path: Path) -> Dict:
        """Config-wide properties merged with per-file filelist overrides."""
        props = dict(self.config.wsi_properties)
        props.update(self.file_properties.get(Path(wsi_path).name, {}))
        return props

    def _resolve_level(self, reader, props: Optional[Dict] = None) -> Tuple[int, float, float]:
        """→ (pyramid level, extra rescaling factor, total downsample).

        Precedence level > target_mpp > target_mag > downsample
        (reference patch_extraction.py:551-749, patch_util.py:112-185).
        """
        props = props if props is not None else self.config.wsi_properties
        downs_all = reader.level_downsamples
        if self.config.level is not None:
            lvl = self.config.level
            if not 0 <= lvl < len(downs_all):
                raise ValueError(
                    f"level {lvl} out of range (slide has {len(downs_all)})"
                )
            return lvl, 1.0, float(downs_all[lvl])
        base_mpp = reader.mpp or props.get("slide_mpp")
        base_mag = reader.magnification or props.get("magnification")
        if self.config.target_mpp is not None:
            if base_mpp is None:
                raise RuntimeError("slide mpp unknown; set wsi_properties.slide_mpp")
            factor = self.config.target_mpp / base_mpp
        elif self.config.target_mag is not None:
            if base_mag is None:
                raise RuntimeError(
                    "slide magnification unknown; set wsi_properties.magnification"
                )
            factor = base_mag / self.config.target_mag
        else:
            factor = float(self.config.downsample)
        if factor < 1:
            factor = 1.0
        downs = reader.level_downsamples
        level = max(i for i, d in enumerate(downs) if d <= factor + 1e-6)
        rescale = factor / downs[level]
        return level, rescale, factor

    # ----------------------------------------------------------- per-WSI

    def _interesting_patches(
        self,
        reader,
        level: int,
        rescale: float,
        tissue_polygons: Optional[List[np.ndarray]] = None,
        otsu_polygons: Optional[List[np.ndarray]] = None,
    ) -> Tuple[List[Tuple[int, int, float]], np.ndarray]:
        """Thumbnail tissue mask → (row, col, background_ratio) grid list.

        Mask source follows reference patch_util.py:396-418: a named
        tissue annotation rasterized directly (optionally intersected with
        Otsu when masked_otsu), else Otsu on the (optionally
        otsu_annotation-masked) thumbnail.
        """
        import cv2

        thumb = reader.get_thumbnail(2000)
        w0, h0 = reader.level_dimensions[0]
        sy0 = thumb.shape[0] / h0  # level-0 → thumbnail scale
        sx0 = thumb.shape[1] / w0

        def rasterize(polys):
            m = np.zeros(thumb.shape[:2], np.uint8)
            for poly in polys:
                pts = np.round(poly * np.array([sx0, sy0])).astype(np.int32)
                cv2.fillPoly(m, [pts], 1)
            return m

        if tissue_polygons:
            tissue = rasterize(tissue_polygons)
            if self.config.masked_otsu:
                otsu = masking.generate_tissue_mask(
                    thumb, mask=tissue,
                    apply_prefilter=self.config.apply_prefilter,
                )
                tissue = (tissue & otsu).astype(np.uint8)
        else:
            otsu_mask = rasterize(otsu_polygons) if otsu_polygons else None
            tissue = masking.generate_tissue_mask(
                thumb, mask=otsu_mask,
                apply_prefilter=self.config.apply_prefilter,
            )
        lw, lh = reader.level_dimensions[level]
        lw, lh = int(lw / rescale), int(lh / rescale)
        n_cols = max(1, math.ceil(lw / self.tile_size))
        n_rows = max(1, math.ceil(lh / self.tile_size))
        # tissue-mask grid cell size in thumbnail pixels
        sy = tissue.shape[0] / lh
        sx = tissue.shape[1] / lw
        thr = self.config.min_intersection_ratio
        if tissue_polygons and self.config.tissue_annotation_intersection_ratio is not None:
            # ROI-annotation threshold (patch_util.py:494)
            thr = self.config.tissue_annotation_intersection_ratio
        interesting = []
        for row in range(n_rows):
            for col in range(n_cols):
                y0 = int((row * self.tile_size - self.overlap_px) * sy)
                y1 = int(((row + 1) * self.tile_size + self.overlap_px) * sy)
                x0 = int((col * self.tile_size - self.overlap_px) * sx)
                x1 = int(((col + 1) * self.tile_size + self.overlap_px) * sx)
                cell = tissue[max(0, y0) : max(0, y1), max(0, x0) : max(0, x1)]
                area = max(1, (y1 - y0) * (x1 - x0))
                tissue_ratio = float(cell.sum()) / area
                bg_ratio = 1.0 - tissue_ratio
                if bg_ratio <= 1.0 - thr:
                    interesting.append((row, col, bg_ratio))
        return interesting, tissue

    def _extract_patch(
        self, reader, level: int, rescale: float, row: int, col: int
    ) -> np.ndarray:
        p = self.config.patch_size
        if rescale == 1.0:
            x = col * self.tile_size - self.overlap_px
            y = row * self.tile_size - self.overlap_px
            return reader.read_region((x, y), level, (p, p))
        import cv2

        src = int(round(p * rescale))
        x = int(round((col * self.tile_size - self.overlap_px) * rescale))
        y = int(round((row * self.tile_size - self.overlap_px) * rescale))
        region = reader.read_region((x, y), level, (src, src))
        return cv2.resize(region, (p, p), interpolation=cv2.INTER_AREA)

    def process_wsi(self, wsi_path: Path) -> Dict:
        from PIL import Image

        cfg = self.config
        name = wsi_path.stem
        wsi_out = self.output / name
        for sub in ("patches", "metadata", "thumbnails", "tissue_masks"):
            (wsi_out / sub).mkdir(parents=True, exist_ok=True)
        if cfg.context_scales:
            for scale in cfg.context_scales:
                (wsi_out / "context" / str(scale)).mkdir(parents=True, exist_ok=True)

        reader = open_slide(str(wsi_path))
        props = self._wsi_properties(wsi_path)
        level, rescale, total_downsample = self._resolve_level(reader, props)
        base_mag = reader.magnification or props.get("magnification")
        base_mpp = reader.mpp or props.get("slide_mpp")
        if cfg.check_resolution is not None:
            # resolution guard (reference cli.py check_resolution)
            if base_mag is None or abs(base_mag - cfg.check_resolution) > 1e-3:
                raise RuntimeError(
                    f"{name}: magnification {base_mag} != required "
                    f"{cfg.check_resolution}"
                )

        # annotations (polygons in level-0 coordinates)
        polygons, region_labels = [], []
        tissue_polys: List[np.ndarray] = []
        otsu_polys: List[np.ndarray] = []
        if cfg.annotation_paths:
            ann_file = (
                Path(cfg.annotation_paths)
                / f"{name}.{cfg.annotation_extension}"
            )
            if ann_file.exists():
                from cellvit_tpu.preprocessing.annotations import load_annotations

                polygons, region_labels = load_annotations(ann_file)
                if cfg.exclude_classes:
                    kept = [
                        (p, l)
                        for p, l in zip(polygons, region_labels)
                        if l not in set(cfg.exclude_classes)
                    ]
                    polygons = [p for p, _ in kept]
                    region_labels = [l for _, l in kept]
                # named tissue polygon is split out of the label set
                # (reference patch_util.py:239-290 get_regions_*)
                if cfg.tissue_annotation is not None:
                    tissue_polys = [
                        p for p, l in zip(polygons, region_labels)
                        if l == cfg.tissue_annotation
                    ]
                    if not tissue_polys:
                        raise RuntimeError(
                            f"tissue annotation '{cfg.tissue_annotation}' not "
                            f"found in {ann_file.name}; consider otsu_annotation "
                            "for a non-strict tissue hint"
                        )
                    kept = [
                        (p, l)
                        for p, l in zip(polygons, region_labels)
                        if l != cfg.tissue_annotation
                    ]
                    polygons = [p for p, _ in kept]
                    region_labels = [l for _, l in kept]
                if cfg.otsu_annotation is not None:
                    otsu_polys = [
                        p for p, l in zip(polygons, region_labels)
                        if l == cfg.otsu_annotation
                    ]
                (wsi_out / "annotation_masks").mkdir(exist_ok=True)
            elif not cfg.incomplete_annotations:
                raise FileNotFoundError(
                    f"annotation file missing for {name}; set "
                    "incomplete_annotations=true to allow"
                )
            else:
                self.logger.warning(f"no annotation file for {name}")

        interesting, tissue_mask = self._interesting_patches(
            reader, level, rescale, tissue_polys, otsu_polys
        )
        self.logger.info(
            f"{name}: level {level} (downsample {total_downsample}), "
            f"{len(interesting)} candidate patches"
        )
        Image.fromarray((tissue_mask * 255).astype(np.uint8)).save(
            wsi_out / "tissue_masks" / "mask_nogrid.png"
        )
        Image.fromarray(reader.get_thumbnail(1024)).save(
            wsi_out / "thumbnails" / "thumbnail.png"
        )
        if cfg.generate_thumbnails:
            # extra overview pyramid (reference generate_thumbnails)
            w0, h0 = reader.level_dimensions[0]
            for ds in (32, 64, 128):
                size = max(64, int(max(w0, h0) / ds))
                Image.fromarray(reader.get_thumbnail(size)).save(
                    wsi_out / "thumbnails" / f"thumbnail_ds_{ds}.png"
                )
        if polygons or tissue_polys:
            # per-label polygon overlays (reference plotting.py:24-157)
            from cellvit_tpu.preprocessing.plotting import (
                generate_polygon_overview,
            )

            thumb = reader.get_thumbnail(1024)
            w0, _ = reader.level_dimensions[0]
            all_polys = list(polygons) + list(tissue_polys)
            all_labels = list(region_labels) + [
                cfg.tissue_annotation or "tissue"
            ] * len(tissue_polys)
            lbl_map = dict(cfg.label_map)
            for l in all_labels:
                lbl_map.setdefault(l, max(lbl_map.values(), default=0) + 1)
            overlays = generate_polygon_overview(
                all_polys, all_labels, lbl_map, thumb,
                downsample=w0 / thumb.shape[1],
            )
            (wsi_out / "annotation_overlays").mkdir(exist_ok=True)
            for key, im in overlays.items():
                Image.fromarray(im).save(
                    wsi_out / "annotation_overlays" / f"{key}.png"
                )

        # thread pool: one native reader handle per worker
        import threading

        local = threading.local()

        def get_reader():
            if not hasattr(local, "reader"):
                local.reader = open_slide(str(wsi_path))
            return local.reader

        def work(item):
            row, col, coarse_bg = item
            patch = self._extract_patch(get_reader(), level, rescale, row, col)
            bg_ratio = masking.calculate_background_ratio(patch, cfg.patch_size)
            if bg_ratio > 1 - cfg.min_intersection_ratio:
                return None
            return row, col, patch, bg_ratio

        with ThreadPoolExecutor(max_workers=cfg.processes) as pool:
            results = [r for r in pool.map(work, interesting) if r is not None]

        if cfg.adjust_brightness and results:
            patches = masking.standardize_brightness([r[2] for r in results])
            results = [(r[0], r[1], p, r[3]) for r, p in zip(results, patches)]

        if cfg.normalize_stains and results:
            patches = [r[2] for r in results]
            patches, _, _ = macenko_normalization(
                patches,
                normalization_vector_path=cfg.normalization_vector_json,
            )
            results = [
                (r[0], r[1], p, r[3]) for r, p in zip(results, patches)
            ]

        from cellvit_tpu.preprocessing.annotations import get_intersected_labels

        total_ds = total_downsample
        context_reader = open_slide(str(wsi_path)) if cfg.context_scales else None

        patch_index = []
        for row, col, patch, bg_ratio in results:
            patch_name = f"{name}_{row}_{col}.png"
            intersected, ratios, ann_mask = [], [], None
            if polygons:
                intersected, ratios, ann_mask = get_intersected_labels(
                    self.tile_size, self.overlap_px, row, col, cfg.label_map,
                    polygons, region_labels,
                    min_intersection_ratio=cfg.min_intersection_ratio_annotation,
                    store_masks=cfg.store_masks,
                    downsample=total_ds,
                    overlapping_labels=cfg.overlapping_labels,
                )
            if cfg.save_only_annotated_patches and not intersected:
                continue
            Image.fromarray(patch).save(wsi_out / "patches" / patch_name)
            if cfg.context_scales:
                # context patches: same center, scale× the field of view,
                # resized to patch_size (reference patch_extraction.py:889-906)
                p_sz = cfg.patch_size
                cx = (col * self.tile_size - self.overlap_px + p_sz / 2) * rescale
                cy = (row * self.tile_size - self.overlap_px + p_sz / 2) * rescale
                for scale in cfg.context_scales:
                    import cv2 as _cv2

                    src = int(round(p_sz * rescale * scale))
                    region = context_reader.read_region(
                        (int(cx - src / 2), int(cy - src / 2)), level, (src, src)
                    )
                    ctx = _cv2.resize(
                        region, (p_sz, p_sz), interpolation=_cv2.INTER_AREA
                    )
                    Image.fromarray(ctx).save(
                        wsi_out / "context" / str(scale) / patch_name
                    )
            if cfg.store_masks and ann_mask is not None:
                np.save(
                    wsi_out / "annotation_masks" / f"{name}_{row}_{col}.npy",
                    ann_mask.astype(np.int32),
                )
            meta = {
                "row": row,
                "col": col,
                "background_ratio": float(bg_ratio),
                "intersected_labels": intersected,
                "label_ratios": ratios,
                "metadata_path": f"./metadata/{name}_{row}_{col}.yaml",
            }
            (wsi_out / "metadata" / f"{name}_{row}_{col}.yaml").write_text(
                yaml.safe_dump({k: v for k, v in meta.items() if k != "metadata_path"})
            )
            patch_index.append({patch_name: meta})

        (wsi_out / "patch_metadata.json").write_text(json.dumps(patch_index, indent=2))
        wsi_metadata = {
            "orig_n_tiles_cols": max((c for _, c, *_ in results), default=0) + 1,
            "orig_n_tiles_rows": max((r for r, *_ in results), default=0) + 1,
            "base_magnification": base_mag,
            "downsampling": total_downsample,
            "label_map": cfg.label_map,
            "magnification": (base_mag / total_downsample) if base_mag else None,
            "base_mpp": base_mpp,
            "target_patch_mpp": (base_mpp * total_downsample) if base_mpp else None,
            "patch_overlap": self.overlap_px * 2,
            "patch_size": cfg.patch_size,
            "patch_distance": self.tile_size,
            "stain_normalization": cfg.normalize_stains,
        }
        (wsi_out / "metadata.yaml").write_text(yaml.safe_dump(wsi_metadata))
        reader.close()

        if cfg.filter_patches:
            # post-extraction DL tissue filter (reference cli.py
            # `filter_patches`; model weights via filter_model_path)
            if cfg.filter_model_path is None:
                self.logger.warning(
                    "filter_patches=true but no filter_model_path; skipping"
                )
            else:
                from cellvit_tpu.preprocessing.tissue_detector import (
                    filter_patches as dl_filter,
                )

                stats = dl_filter(wsi_out, cfg.filter_model_path)
                self.logger.info(f"{name}: patch filter {stats}")
                patch_index = json.loads(
                    (wsi_out / "patch_metadata.json").read_text()
                )
        return {"n_patches": len(patch_index), "output": str(wsi_out)}

    def sample_patches_dataset(self) -> List[Dict]:
        """Process all slides, honoring `processed.json` resume."""
        processed = set(self._load_processed())
        out = []
        for path in self.files:
            if not self.config.overwrite and path.name in processed:
                self.logger.info(f"skipping {path.name} (processed)")
                continue
            out.append(self.process_wsi(path))
            self._mark_processed(path.name)
        return out
