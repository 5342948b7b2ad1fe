"""WSI annotation handling: parsing, masks, per-patch label intersection.

Reference parity: `preprocessing/patch_extraction/src/utils/patch_util.py`
annotation helpers (:188-287 XML/JSON→polygons, `get_intersected_labels`
:958-1065, `polygon_to_patch_mask`) — without shapely: polygons are raw
vertex arrays, intersections are computed by rasterizing onto patch-local
canvases (cv2.fillPoly), which handles holes/self-touching outlines that
shapely needed `buffer(0)` fixes for.

Supported formats:
* GeoJSON / QuPath JSON: FeatureCollection or list of Features with
  Polygon/MultiPolygon geometries and `properties.classification.name`;
* ASAP XML: `<Annotation PartOfGroup=...><Coordinates><Coordinate X Y/>`.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

Polygon = np.ndarray  # (N, 2) float array of (x, y) level-0 coordinates


def load_annotations(
    path: Union[str, Path]
) -> Tuple[List[Polygon], List[str]]:
    """Annotation file → (polygons, labels)."""
    path = Path(path)
    if path.suffix.lower() == ".xml":
        return _load_asap_xml(path)
    return _load_geojson(path)


def _load_geojson(path: Path) -> Tuple[List[Polygon], List[str]]:
    data = json.loads(path.read_text())
    features = data.get("features", data if isinstance(data, list) else [data])
    polygons: List[Polygon] = []
    labels: List[str] = []
    for feat in features:
        geom = feat.get("geometry", feat)
        props = feat.get("properties", {})
        label = (
            props.get("classification", {}).get("name")
            or props.get("label")
            or "object"
        )
        gtype = geom.get("type")
        if gtype == "Polygon":
            rings = [geom["coordinates"]]
        elif gtype == "MultiPolygon":
            rings = geom["coordinates"]
        else:
            continue
        for poly in rings:
            exterior = np.asarray(poly[0], np.float64)
            polygons.append(exterior)
            labels.append(label)
    return polygons, labels


def _load_asap_xml(path: Path) -> Tuple[List[Polygon], List[str]]:
    root = ET.parse(path).getroot()
    polygons: List[Polygon] = []
    labels: List[str] = []
    for ann in root.iter("Annotation"):
        label = ann.get("PartOfGroup") or ann.get("Name") or "object"
        coords = [
            (float(c.get("X")), float(c.get("Y")))
            for c in ann.iter("Coordinate")
        ]
        if len(coords) >= 3:
            polygons.append(np.asarray(coords, np.float64))
            labels.append(label)
    return polygons, labels


def polygons_to_mask(
    polygons: Sequence[Polygon],
    labels: Sequence[str],
    shape: Tuple[int, int],
    label_map: Dict[str, int],
    downsample: float = 1.0,
) -> np.ndarray:
    """Rasterize labeled polygons into an int mask at `shape`.

    Overlaps resolve by label_map priority (higher id wins — reference
    `get_intersected_labels` ordering).
    """
    mask = np.zeros(shape, np.int32)
    order = sorted(
        range(len(polygons)), key=lambda i: label_map.get(labels[i], 0)
    )
    for i in order:
        lbl = label_map.get(labels[i])
        if lbl is None:
            continue
        pts = np.round(polygons[i] / downsample).astype(np.int32)
        cv2.fillPoly(mask, [pts], int(lbl))
    return mask


def get_intersected_labels(
    tile_size: int,
    patch_overlap: int,
    row: int,
    col: int,
    label_map: Dict[str, int],
    polygons: Sequence[Polygon],
    region_labels: Sequence[str],
    min_intersection_ratio: float = 0.0,
    store_masks: bool = False,
    downsample: float = 1.0,
    overlapping_labels: bool = False,
) -> Tuple[List[int], List[float], Optional[np.ndarray]]:
    """Labels intersecting patch (row, col) with their area ratios.

    Patch origin follows the DeepZoom tiling math (`x = col·tile −
    overlap`); polygons are level-0 referenced and get scaled by
    `downsample`. Returns (labels, ratios, optional patch mask).

    By default overlapping annotations resolve by label-map priority
    (higher id wins) into one int mask. With `overlapping_labels` the
    stored mask is a (H, W, n_intersected) per-label binary stack
    instead (reference cli.py `overlapping_labels`).
    """
    patch_size = tile_size + 2 * patch_overlap
    x0 = (col * tile_size - patch_overlap) * downsample
    y0 = (row * tile_size - patch_overlap) * downsample
    canvas = np.zeros((patch_size, patch_size), np.int32)
    per_label: Dict[int, np.ndarray] = {}
    areas: Dict[int, int] = {}
    order = sorted(
        range(len(polygons)), key=lambda i: label_map.get(region_labels[i], 0)
    )
    for i in order:
        lbl = label_map.get(region_labels[i])
        if lbl is None or lbl == 0:
            continue
        pts = np.round(
            (polygons[i] - np.array([x0, y0])) / downsample
        ).astype(np.int32)
        if pts[:, 0].max() < 0 or pts[:, 1].max() < 0:
            continue
        if pts[:, 0].min() >= patch_size or pts[:, 1].min() >= patch_size:
            continue
        single = np.zeros_like(canvas)
        cv2.fillPoly(single, [pts], 1)
        area = int(single.sum())
        if area:
            canvas[single > 0] = lbl
            areas[lbl] = areas.get(lbl, 0) + area
            if overlapping_labels and store_masks:
                acc = per_label.setdefault(lbl, np.zeros_like(canvas))
                acc |= single

    total = patch_size * patch_size
    labels_out, ratios = [], []
    for lbl, area in sorted(areas.items()):
        ratio = area / total
        if ratio > min_intersection_ratio:
            labels_out.append(lbl)
            ratios.append(float(ratio))
    if not store_masks:
        return labels_out, ratios, None
    if overlapping_labels:
        stack = (
            np.stack([per_label[lbl] for lbl in labels_out], axis=-1)
            if labels_out
            else np.zeros((patch_size, patch_size, 0), np.int32)
        )
        return labels_out, ratios, stack
    return labels_out, ratios, canvas
