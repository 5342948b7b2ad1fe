"""Validation example-image plotting.

Reference parity: `trainer/trainer_cellvit.py:842-1029`
(generate_example_image) and the inference `plot_results` — side-by-side
panels of input, predicted/GT binary maps, HV maps and instance contours,
written as PNGs into the run directory (and forwarded to wandb when the
metric logger has a live run).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np


def _instance_contours_overlay(img: np.ndarray, inst: np.ndarray) -> np.ndarray:
    import cv2

    overlay = (img * 255).clip(0, 255).astype(np.uint8).copy()
    for inst_id in np.unique(inst):
        if inst_id == 0:
            continue
        mask = (inst == inst_id).astype(np.uint8)
        contours, _ = cv2.findContours(
            mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        cv2.drawContours(overlay, contours, -1, (0, 255, 0), 1)
    return overlay


def generate_example_image(
    imgs: np.ndarray,
    pred_inst: np.ndarray,
    gt_inst: np.ndarray,
    pred_binary: np.ndarray,
    gt_binary: np.ndarray,
    hv_pred: Optional[np.ndarray] = None,
    hv_gt: Optional[np.ndarray] = None,
    num_images: int = 4,
    outfile: Optional[Union[str, Path]] = None,
):
    """Panel figure for up to `num_images` samples.

    Args:
        imgs: (B, H, W, 3) in normalized space ((x·0.5)+0.5 display mapping).
        pred_inst/gt_inst: (B, H, W) instance maps.
        pred_binary/gt_binary: (B, H, W) {0,1} maps.
        hv_pred/hv_gt: optional (B, H, W, 2).
    Returns the matplotlib figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(num_images, imgs.shape[0])
    cols = 4 + (2 if hv_pred is not None else 0)
    fig, axes = plt.subplots(n, cols, figsize=(3 * cols, 3 * n), squeeze=False)
    for i in range(n):
        display = np.clip(imgs[i] * 0.5 + 0.5, 0, 1)
        panels = [
            (_instance_contours_overlay(display, np.asarray(pred_inst[i])), "pred instances"),
            (_instance_contours_overlay(display, np.asarray(gt_inst[i])), "gt instances"),
            (pred_binary[i], "pred binary"),
            (gt_binary[i], "gt binary"),
        ]
        if hv_pred is not None:
            panels.append((hv_pred[i][..., 0], "pred HV (h)"))
            panels.append((hv_gt[i][..., 0], "gt HV (h)"))
        for j, (panel, title) in enumerate(panels):
            ax = axes[i][j]
            if panel.ndim == 2:
                ax.imshow(panel, cmap="viridis")
            else:
                ax.imshow(panel)
            ax.set_title(title, fontsize=8)
            ax.axis("off")
    fig.tight_layout()
    if outfile is not None:
        Path(outfile).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(outfile, dpi=100)
        plt.close(fig)
    return fig
