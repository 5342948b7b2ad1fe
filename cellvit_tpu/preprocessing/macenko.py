"""Macenko stain normalization (pure numpy).

Port of the reference math (`patch_util.py:801-933`): OD conversion,
eigenvector plane projection, percentile stain angles, least-squares
saturations, renormalization against reference H&E vectors. The default
reference vectors are the ones the reference ships
(`NormalizeParameters`, patch_util.py:700-776).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np

DEFAULT_MAX_SAT = np.array([[1.9713055649557338], [0.741354425035508]])
DEFAULT_HE_REF = np.array(
    [
        [0.5001340654085598, 0.004804369872676684],
        [0.7272425313652708, 0.7330272758823506],
        [0.47008958421915664, 0.6801822776599128],
    ]
)


def rgb_to_od(img: np.ndarray, light_intensity: int = 255) -> np.ndarray:
    img = img.copy()
    img[img == 0] = 1
    return -np.log(img.astype(np.float64) / light_intensity)


def load_normalization_vectors(path: Union[str, Path]) -> Tuple[np.ndarray, np.ndarray]:
    with open(path) as f:
        data = json.load(f)
    return np.array(data["stain_vectors"]), np.array(data["max_sat"])


def macenko_normalization(
    patches: List[np.ndarray],
    beta: float = 0.15,
    alpha: float = 1,
    light_intensity: int = 255,
    normalization_vector_path: Optional[Union[str, Path]] = None,
) -> Tuple[List[np.ndarray], Optional[np.ndarray], Optional[np.ndarray]]:
    """Normalize a list of RGB patches; returns (patches, stain_vectors,
    max_sat). On numerical failure returns the inputs unchanged (reference
    behavior)."""
    he_ref, max_sat_ref = DEFAULT_HE_REF, DEFAULT_MAX_SAT
    if normalization_vector_path is not None:
        he_ref, max_sat_ref = load_normalization_vectors(normalization_vector_path)

    h, w, c = patches[0].shape
    stacked = np.stack(patches, axis=0).reshape(-1, 3)
    od = rgb_to_od(stacked, light_intensity)
    non_transparent = (od > beta).any(axis=1)
    if non_transparent.sum() < 16:
        return patches, None, None

    try:
        _, eig_vecs = np.linalg.eigh(np.cov(od[non_transparent], rowvar=False))
    except np.linalg.LinAlgError:
        return patches, None, None

    eig_vecs = eig_vecs[:, 1:3]
    if eig_vecs[0, 0] < 0:
        eig_vecs[:, 0] *= -1
    if eig_vecs[0, 1] < 0:
        eig_vecs[:, 1] *= -1

    t_hat = od[non_transparent].dot(eig_vecs)
    phi = np.arctan2(t_hat[:, 1], t_hat[:, 0])
    min_phi = np.percentile(phi, alpha)
    max_phi = np.percentile(phi, 100 - alpha)
    v_min = eig_vecs.dot(np.array([[np.cos(min_phi), np.sin(min_phi)]]).T)
    v_max = eig_vecs.dot(np.array([[np.cos(max_phi), np.sin(max_phi)]]).T)
    if v_min[0] > v_max[0]:
        stain_vectors = np.array([v_min[:, 0], v_max[:, 0]]).T
    else:
        stain_vectors = np.array([v_max[:, 0], v_min[:, 0]]).T

    sat = np.linalg.lstsq(stain_vectors, od[non_transparent].T, rcond=None)[0]
    max_sat = np.percentile(sat, 99, axis=1, keepdims=True)
    sat = sat / max_sat * max_sat_ref

    od[non_transparent] = -he_ref.dot(sat).T
    i_norm = (light_intensity * np.exp(od)).reshape(len(patches), h, w, c)
    np.clip(np.round(i_norm), 0, 255, out=i_norm)
    return [p.astype(np.uint8) for p in i_norm], stain_vectors, max_sat


def fit_normalization_vectors(
    patches: List[np.ndarray], output_path: Union[str, Path],
    beta: float = 0.15, alpha: float = 1,
) -> None:
    """Fit and persist stain vectors for a dataset
    (reference scripts/macenko.py)."""
    _, stain_vectors, max_sat = macenko_normalization(patches, beta, alpha)
    if stain_vectors is None:
        raise RuntimeError("stain-vector estimation failed")
    Path(output_path).write_text(
        json.dumps(
            {"stain_vectors": stain_vectors.tolist(), "max_sat": max_sat.tolist()}
        )
    )
