"""Per-pixel error analysis of hard vs easy views (round-3 quality item).

Renders selected views from a checkpoint and decomposes the MSE into
background (GT white) vs object pixels, and silhouette-edge vs interior,
to localize why low-elevation views cap ~20 dB while top-down views
reach ~25 dB. Writes error-map PNGs + a JSON summary.

Usage: python -u scripts/diag_view_error.py [ckpt] [view ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tinynerf_tpu.data import ensure_data
from tinynerf_tpu.utils.model_io import load_model_and_renderer
from tinynerf_tpu.utils.image_io import write_png
from tinynerf_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/r3_h256_f128.npz"
    views = [int(v) for v in sys.argv[2:]] or [7, 10, 53, 62, 96, 101]
    d = ensure_data("data/tiny_nerf_data.npz", allow_synthetic=True)
    images, poses, focal = d["images"], d["poses"], float(d["focal"])
    H, W = images.shape[1:3]
    params, renderer, meta = load_model_and_renderer(
        ckpt, H=H, W=W, focal=focal, n_samples=64, near=2.0, far=6.0, chunk=8192
    )
    print(f"[ckpt] {ckpt} model={meta['model']} step={meta['step']}")

    out = {}
    for v in views:
        img = np.asarray(renderer(params, jnp.asarray(poses[v])))
        gt = np.asarray(images[v])
        err = (img - gt) ** 2
        mse = err.mean()
        psnr = -10 * np.log10(max(mse, 1e-10))
        bg = (gt > 0.995).all(axis=-1)  # white-background pixels
        # silhouette band: background-ness changes within 1px
        from scipy import ndimage  # noqa: F401  (not available? fall back)
        try:
            import scipy.ndimage as ndi
            edge = ndi.binary_dilation(bg, iterations=2) & ndi.binary_dilation(~bg, iterations=2)
        except Exception:
            gx = np.abs(np.diff(bg.astype(np.float32), axis=0, prepend=0))
            gy = np.abs(np.diff(bg.astype(np.float32), axis=1, prepend=0))
            edge = (gx + gy) > 0
        interior = ~bg & ~edge
        rows = {
            "psnr": float(psnr),
            "frac_bg": float(bg.mean()),
            "frac_edge": float(edge.mean()),
            "mse_total": float(mse),
            "mse_bg": float(err[bg].mean()) if bg.any() else 0.0,
            "mse_edge": float(err[edge].mean()) if edge.any() else 0.0,
            "mse_interior": float(err[interior].mean()) if interior.any() else 0.0,
            # how much of total summed error each region owns
            "share_bg": float(err[bg].sum() / err.sum()),
            "share_edge": float(err[edge].sum() / err.sum()),
            "share_interior": float(err[interior].sum() / err.sum()),
        }
        out[v] = rows
        print(f"view {v:3d}: psnr {psnr:5.2f}  share bg/edge/int = "
              f"{rows['share_bg']:.2f}/{rows['share_edge']:.2f}/{rows['share_interior']:.2f}  "
              f"mse bg/edge/int = {rows['mse_bg']:.4f}/{rows['mse_edge']:.4f}/{rows['mse_interior']:.4f}")
        emap = (err.sum(-1) / err.sum(-1).max() * 255).astype(np.uint8)
        write_png(f"/tmp/diag_err_{v}.png", np.stack([emap] * 3, -1))
        write_png(f"/tmp/diag_render_{v}.png", (np.clip(img, 0, 1) * 255).astype(np.uint8))
        write_png(f"/tmp/diag_gt_{v}.png", (gt * 255).astype(np.uint8))
    with open("/tmp/diag_view_error.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
