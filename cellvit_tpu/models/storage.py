"""Typed prediction/GT containers for the HoVer-Net / StarDist / CPP heads.

Parity targets: `DataclassHVStorage` (reference cellvit.py:668-766),
`DataclassStarDistStorage` (cellvit_stardist.py:436-487) and
`DataclassCPPStorage` (cellvit_cpp_net.py:632-683). Shapes are channel-last
(NHWC) to match this framework's model outputs; `get_dict()` returns the
plain-dict view the trainers operate on (the trainers here are functional
and accept either the dataclass or the dict).
"""

from __future__ import annotations

from dataclasses import dataclass, fields
from typing import Any, Dict, List, Optional

Array = Any  # jax.Array or np.ndarray


def _get_dict(obj, drop_none_regression: bool = False) -> Dict:
    d = {f.name: getattr(obj, f.name) for f in fields(obj)}
    if drop_none_regression and not d.get("regression_loss", False):
        d.pop("regression_map", None)
    return d


@dataclass
class DataclassHVStorage:
    """HoVer-Net branch container (NHWC).

    nuclei_binary_map (B, H, W, 2) softmax · hv_map (B, H, W, 2) ·
    nuclei_type_map (B, H, W, num_nuclei_classes) softmax ·
    tissue_types (B, num_tissue_classes) logits ·
    instance_map (B, H, W) int · instance_types_nuclei
    (B, H, W, num_nuclei_classes) int · instance_types: per-image dicts
    {id: {bbox, centroid, contour, type_prob, type}}.
    """

    nuclei_binary_map: Array
    hv_map: Array
    tissue_types: Array
    nuclei_type_map: Array
    instance_map: Array
    instance_types_nuclei: Array
    batch_size: int
    instance_types: Optional[List] = None
    regression_map: Optional[Array] = None
    regression_loss: bool = False
    h: int = 256
    w: int = 256
    num_tissue_classes: int = 19
    num_nuclei_classes: int = 6

    def get_dict(self) -> Dict:
        return _get_dict(self, drop_none_regression=True)


@dataclass
class DataclassStarDistStorage:
    """StarDist branch container (NHWC): dist_map (B, H, W, 1) logits ·
    stardist_map (B, H, W, n_rays) · nuclei_type_map
    (B, H, W, num_nuclei_classes) softmax."""

    dist_map: Array
    stardist_map: Array
    nuclei_type_map: Array
    batch_size: int
    dist_map_sigmoid: Optional[Array] = None
    instance_map: Optional[Array] = None
    instance_types_nuclei: Optional[Array] = None
    instance_types: Optional[List] = None
    tissue_types: Optional[Array] = None
    h: int = 256
    w: int = 256
    num_tissue_classes: int = 19
    num_nuclei_classes: int = 6

    def get_dict(self) -> Dict:
        return _get_dict(self)


@dataclass
class DataclassCPPStorage(DataclassStarDistStorage):
    """CPP-Net container: StarDist fields + the refined ray map
    stardist_map_refined (B, H, W, n_rays)."""

    stardist_map_refined: Optional[Array] = None

    def get_dict(self) -> Dict:
        return _get_dict(self)
