"""Novel-view spiral GIF renderer.

Parity with the reference `src/make_gif.py:9-33`: load the latest
checkpoint (rebuilding the model from its stored cfg), build a 60-frame
spiral path around pose 0 (radius 0.3), render each frame with the
chunked renderer, and write outputs/novel_views.gif at fps=15, loop=0.

TPU-native: the per-frame render is one jitted program reused across
all frames (compile once, 60 executions), optionally through the fused
Pallas kernel.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.data import ensure_data
from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.camera import spiral_poses
from tinynerf_tpu.ops.encoding import encoding_dim
from tinynerf_tpu.render import make_image_renderer
from tinynerf_tpu.training import TrainSettings, init_train_state, make_optimizer
from tinynerf_tpu.utils import checkpoint as ckpt_lib
from tinynerf_tpu.utils.cli import cli
from tinynerf_tpu.utils.image_io import write_gif


@dataclass
class GifConfig:
    ckpt_path: str = "checkpoints/tinynerf_latest.npz"
    data_path: str = "data/tiny_nerf_data.npz"
    out_path: str = "outputs/novel_views.gif"
    n_frames: int = 60
    radius: float = 0.3
    fps: int = 15
    n_samples: int = 64
    near: float = 2.0
    far: float = 6.0
    chunk: int = 8192
    fused: bool = False
    allow_synthetic: bool = True


def main(cfg: GifConfig = GifConfig()) -> None:
    from tinynerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    d = ensure_data(cfg.data_path, allow_synthetic=cfg.allow_synthetic)
    poses = jnp.asarray(d["poses"])
    focal = float(d["focal"])
    _, H, W, _ = d["images"].shape

    # Rebuild the model from the checkpoint's stored cfg (with the
    # reference's fallback defaults, src/make_gif.py:19).
    import json as _json

    with np.load(cfg.ckpt_path, allow_pickle=False) as z:
        meta = _json.loads(str(z["meta"]))["meta"]
    mcfg_d = meta.get("cfg", {"hidden": 128, "depth": 4, "skip_at": 2, "num_freqs": 10})
    num_freqs = mcfg_d.get("num_freqs", 10)
    model_kind = meta.get("model", "tinynerf")

    if model_kind == "nerf":
        from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf
        from tinynerf_tpu.render import make_hierarchical_image_renderer

        ncfg = NeRFConfig(
            num_freqs=num_freqs,
            num_freqs_dir=mcfg_d.get("num_freqs_dir", 4),
            hidden=mcfg_d["hidden"],
            depth=mcfg_d["depth"],
            skip_at=mcfg_d["skip_at"],
            rgb_hidden=mcfg_d.get("rgb_hidden", 64),
        )
        settings = TrainSettings(num_freqs=num_freqs, n_samples=cfg.n_samples)
        params_t, opt_t = init_train_state(
            jax.random.PRNGKey(0), settings, init_fn=lambda k: init_nerf(k, ncfg)
        )
        renderer = make_hierarchical_image_renderer(
            H=H,
            W=W,
            focal=focal,
            chunk=min(cfg.chunk, 4096),
            n_coarse=cfg.n_samples,
            n_fine=mcfg_d.get("n_fine", 64),
            near=cfg.near,
            far=cfg.far,
            nerf_cfg=ncfg,
            use_fused=cfg.fused,
        )
    else:
        model_cfg = TinyNeRFConfig(
            in_dim=encoding_dim(num_freqs),
            hidden=mcfg_d["hidden"],
            depth=mcfg_d["depth"],
            skip_at=mcfg_d["skip_at"],
        )
        settings = TrainSettings(num_freqs=num_freqs, model_cfg=model_cfg)
        params_t, opt_t = init_train_state(jax.random.PRNGKey(0), settings)
        renderer = make_image_renderer(
            H=H,
            W=W,
            focal=focal,
            chunk=cfg.chunk,
            n_samples=cfg.n_samples,
            near=cfg.near,
            far=cfg.far,
            num_freqs=num_freqs,
            model_cfg=model_cfg,
            use_fused=cfg.fused,
        )
    params, _, step, _ = ckpt_lib.restore_checkpoint(cfg.ckpt_path, params_t, opt_t)
    print(f"[ckpt] loaded {cfg.ckpt_path} (step {step}, model {model_kind})")

    path = spiral_poses(poses[0], n_frames=cfg.n_frames, radius=cfg.radius)
    frames = []
    t0 = time.time()
    for i in range(cfg.n_frames):
        frames.append(np.asarray(renderer(params, path[i])))
        print(f"[render] {i + 1}/{cfg.n_frames}", end="\r")
    dt = time.time() - t0
    write_gif(cfg.out_path, frames, fps=cfg.fps, loop=0)
    print(f"\n[ok] wrote {cfg.out_path} ({cfg.n_frames} frames in {dt:.1f}s)")


if __name__ == "__main__":
    main(cli(GifConfig, description="Render a novel-view spiral GIF"))
