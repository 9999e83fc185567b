"""Evaluation: held-out-view PSNR.

The reference reports only train-batch PSNR (src/train.py:123,130-131).
This adds proper novel-view evaluation: render full images for held-out
poses and compare to ground truth — the metric NeRF papers actually
report.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from tinynerf_tpu.utils.metrics import psnr, ssim


def evaluate_views(
    renderer, params, images, poses, indices: Sequence[int]
) -> Dict[str, float]:
    """Render each pose in `indices`; PSNR + SSIM against ground truth.

    renderer: jitted (params, pose) -> (H, W, 3).
    Returns {"psnr_mean", "psnr_min", "psnr_max", "ssim_mean",
    "per_view": [...]}.
    """
    scores, ssims = [], []
    for i in indices:
        img = renderer(params, poses[i])
        scores.append(float(psnr(img, images[i])))
        ssims.append(float(ssim(img, images[i])))
    return {
        "psnr_mean": float(np.mean(scores)),
        "psnr_min": float(np.min(scores)),
        "psnr_max": float(np.max(scores)),
        "ssim_mean": float(np.mean(ssims)),
        "per_view": [round(s, 3) for s in scores],
    }
