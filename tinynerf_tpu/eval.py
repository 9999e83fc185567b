"""Evaluation driver: `python -m tinynerf_tpu.eval --ckpt-path ...`

Renders a set of dataset views from a checkpoint and reports per-view
and aggregate PSNR + SSIM (the reference has no evaluation tool — it
reports only the train-batch PSNR in its tqdm bar, src/train.py:130).
Optionally saves the rendered images next to the metrics.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional


import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.data import ensure_data
from tinynerf_tpu.evaluation import evaluate_views
from tinynerf_tpu.utils.cli import cli
from tinynerf_tpu.utils.image_io import write_png
from tinynerf_tpu.utils.model_io import load_model_and_renderer


@dataclass
class EvalConfig:
    ckpt_path: str = "checkpoints/tinynerf_latest.npz"
    data_path: str = "data/tiny_nerf_data.npz"
    out_dir: str = "outputs/eval"
    views: int = 8  # number of evenly spaced views (0 = all)
    first_view: int = 0  # start index over the ORIGINAL pose order.
    # NOTE: for checkpoints trained with --holdout-mode strided, a tail
    # slice is NOT the held-out set — use --holdout-views instead.
    holdout_views: bool = False  # evaluate exactly the poses the
    # checkpoint recorded as held out (meta["holdout"]["indices"];
    # correct for both tail and strided holdouts)
    ema: bool = False  # score the Polyak-averaged weights: loads the
    # `<ckpt-path>.ema.npz` twin that train writes when --ema-decay > 0
    # (same schema, averaged params) — the lever's benefit was otherwise
    # unmeasured outside the train driver's held-out snapshots
    n_samples: int = 64
    # None = the checkpoint's fine-sample count; an int (incl. 0)
    # overrides it (0 = coarse/grid budget only).
    n_fine: Optional[int] = None
    near: float = 2.0
    far: float = 6.0
    chunk: int = 8192
    fused: bool = False
    save_images: bool = True
    save_error_maps: bool = False  # also write err_<i>.png per view:
    # per-pixel |render - gt| (mean over rgb), tone-mapped so 0.25
    # absolute error saturates — shows WHERE quality is lost (thin
    # structures vs texture vs silhouettes)
    save_depth: bool = False  # also write depth_<i>.png (disparity-
    # style tone map: near = bright, masked where acc < 0.1) and
    # acc_<i>.png per view — the geometry the model learned, invisible
    # in RGB (the original NeRF's depth renders; no reference analog)
    allow_synthetic: bool = True


def main(cfg: EvalConfig = EvalConfig()) -> dict:
    from tinynerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    d = ensure_data(cfg.data_path, allow_synthetic=cfg.allow_synthetic)
    images = jnp.asarray(d["images"])
    poses = jnp.asarray(d["poses"])
    focal = float(d["focal"])
    n_images, H, W, _ = images.shape

    ckpt_path = cfg.ckpt_path
    if cfg.ema:
        ckpt_path = cfg.ckpt_path + ".ema.npz"
        if not os.path.exists(ckpt_path):
            raise FileNotFoundError(
                f"--ema: no Polyak twin at {ckpt_path} (the trainer only "
                "writes it when run with --ema-decay > 0)"
            )
    params, renderer, meta = load_model_and_renderer(
        ckpt_path, H=H, W=W, focal=focal, n_samples=cfg.n_samples,
        near=cfg.near, far=cfg.far, chunk=cfg.chunk, fused=cfg.fused,
        n_fine=cfg.n_fine,
    )
    print(
        f"[ckpt] {ckpt_path} (model {meta['model']}, step {meta['step']}"
        + (", EMA weights" if cfg.ema else "") + ")"
    )

    if cfg.holdout_views:
        hold = meta.get("holdout")
        if not hold:
            raise ValueError(
                "--holdout-views: this checkpoint has no holdout metadata "
                "(trained without --holdout, or by an older version)"
            )
        indices = [int(i) for i in hold["indices"]]
        print(f"[eval] checkpoint held-out poses ({hold['mode']}): {indices}")
    else:
        pool = list(range(cfg.first_view, n_images))
        if cfg.views and cfg.views < len(pool):
            stride = max(1, len(pool) // cfg.views)
            indices = pool[::stride][: cfg.views]
        else:
            indices = pool
    res = evaluate_views(renderer, params, images, poses, indices)
    print(
        f"[eval] {len(indices)} views: PSNR mean {res['psnr_mean']:.2f} dB "
        f"(min {res['psnr_min']:.2f} / max {res['psnr_max']:.2f}), "
        f"SSIM mean {res['ssim_mean']:.4f}"
    )
    os.makedirs(cfg.out_dir, exist_ok=True)
    with open(f"{cfg.out_dir}/metrics.json", "w") as f:
        json.dump({"indices": indices, **res}, f, indent=2)
    aux_renderer = None
    if cfg.save_depth:
        # A twin GEOMETRY renderer over the same checkpoint (packed
        # depth/acc pseudo-images — render.pack_aux). The duplicate
        # param load is a few MB; not worth complicating the loader API.
        _, aux_renderer, _ = load_model_and_renderer(
            ckpt_path, H=H, W=W, focal=focal, n_samples=cfg.n_samples,
            near=cfg.near, far=cfg.far, chunk=cfg.chunk, fused=cfg.fused,
            n_fine=cfg.n_fine, aux=True,
        )
    if cfg.save_images or cfg.save_error_maps or cfg.save_depth:
        from tinynerf_tpu.render import unpack_aux

        # NDC checkpoints sample t in [0,1] (model_io remaps near/far).
        near, far = (0.0, 1.0) if meta.get("cfg", {}).get("ndc") else (
            cfg.near, cfg.far
        )
        for i in indices:
            img = np.asarray(renderer(params, poses[i]))
            if cfg.save_images:
                write_png(f"{cfg.out_dir}/view_{i:03d}.png", img)
            if cfg.save_error_maps:
                err = np.abs(img - np.asarray(images[i])).mean(axis=-1)
                err = np.clip(err / 0.25, 0.0, 1.0)
                write_png(
                    f"{cfg.out_dir}/err_{i:03d}.png",
                    np.stack([err, err, err], axis=-1),
                )
            if cfg.save_depth:
                depth, acc = unpack_aux(
                    np.asarray(aux_renderer(params, poses[i])), near, far
                )
                # Disparity-style tone map (near = bright); empty rays
                # (acc below 0.1) render black instead of the arbitrary
                # depth a near-zero weight sum would imply.
                d_norm = np.clip((depth - near) / (far - near), 0.0, 1.0)
                shade = (1.0 - d_norm) * (acc >= 0.1)
                write_png(
                    f"{cfg.out_dir}/depth_{i:03d}.png",
                    np.stack([shade] * 3, axis=-1),
                )
                write_png(
                    f"{cfg.out_dir}/acc_{i:03d}.png",
                    np.stack([np.clip(acc, 0.0, 1.0)] * 3, axis=-1),
                )
        print(f"[eval] wrote renders + metrics.json to {cfg.out_dir}")
    return res


if __name__ == "__main__":
    main(cli(EvalConfig, description="Evaluate a checkpoint: PSNR/SSIM over views"))
