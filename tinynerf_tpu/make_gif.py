"""Novel-view spiral GIF renderer.

Parity with the reference `src/make_gif.py:9-33`: load the latest
checkpoint (rebuilding the model from its stored cfg), build a 60-frame
spiral path around pose 0 (radius 0.3), render each frame with the
chunked renderer, and write outputs/novel_views.gif at fps=15, loop=0.

TPU-native: ALL frames render inside one jitted program (lax.map over
the pose batch — one dispatch + one device->host transfer for the
whole spiral, vs the reference's 60 sequential render_one calls),
optionally through the fused Pallas kernels; works for both model
families (tinynerf and the hierarchical nerf) via the checkpoint's
stored model kind.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.data import ensure_data
from tinynerf_tpu.ops.camera import spiral_poses
from tinynerf_tpu.utils.cli import cli
from tinynerf_tpu.utils.image_io import write_gif
from tinynerf_tpu.utils.model_io import load_model_and_renderer


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
    depth: bool = False  # render the DEPTH spiral instead of color:
    # disparity-style tone map (near = bright, empty rays black) from
    # the geometry renderer (render.pack_aux). The original NeRF's
    # depth video; no reference analog.
    allow_synthetic: bool = True


def main(cfg: GifConfig = GifConfig()) -> None:
    from tinynerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    d = ensure_data(cfg.data_path, allow_synthetic=cfg.allow_synthetic)
    poses = jnp.asarray(d["poses"])
    focal = float(d["focal"])
    _, H, W, _ = d["images"].shape

    params, renderer, meta = load_model_and_renderer(
        cfg.ckpt_path, H=H, W=W, focal=focal, n_samples=cfg.n_samples,
        near=cfg.near, far=cfg.far, chunk=cfg.chunk, fused=cfg.fused,
        frames=True, aux=cfg.depth,
    )
    print(f"[ckpt] loaded {cfg.ckpt_path} (step {meta['step']}, model {meta['model']})")

    path = spiral_poses(poses[0], n_frames=cfg.n_frames, radius=cfg.radius)
    # Quantize to uint8 ON DEVICE: the GIF needs nothing more, and it
    # shrinks the device->host transfer 4x (same truncation the host
    # path applies, so pixels are bit-identical).
    if cfg.depth:
        # Tone-map the packed (depth, acc) channels on device: shade =
        # disparity gated on acc >= 0.1, broadcast to gray rgb.
        def tone(p, x):
            out = renderer(p, x)
            shade = (1.0 - out[..., 0]) * (out[..., 1] >= 0.1)
            gray = jnp.clip(shade, 0.0, 1.0)[..., None] * jnp.ones((3,))
            return (gray * 255).astype(jnp.uint8)

        quantized = jax.jit(tone)
    else:
        quantized = jax.jit(
            lambda p, x: (jnp.clip(renderer(p, x), 0.0, 1.0) * 255).astype(jnp.uint8)
        )
    t0 = time.time()
    frames = np.asarray(quantized(params, path))  # one dispatch, all frames
    dt = time.time() - t0
    write_gif(cfg.out_path, list(frames), fps=cfg.fps, loop=0)
    print(f"[ok] wrote {cfg.out_path} ({cfg.n_frames} frames in {dt:.1f}s)")


if __name__ == "__main__":
    main(cli(GifConfig, description="Render a novel-view spiral GIF"))
