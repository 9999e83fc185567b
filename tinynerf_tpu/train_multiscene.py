"""Multi-scene batched training driver (BASELINE config 5):
`python -m tinynerf_tpu.train_multiscene --scenes 8 --size 400`

Trains K independent TinyNeRFs simultaneously — one per synthetic
scene at the requested resolution (default 400x400) — with the scene
axis sharded across all local devices and scenes vmapped within each
device. Reports per-scene loss/PSNR and writes one preview per scene
plus a batched checkpoint.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.multiscene import (
    init_multiscene_state,
    make_multiscene_train_block,
    scene_params,
)
from tinynerf_tpu.ops.rays import get_rays_for_poses
from tinynerf_tpu.parallel.mesh import make_mesh, mesh_axes
from tinynerf_tpu.render import make_image_renderer
from tinynerf_tpu.training import TrainSettings
from tinynerf_tpu.utils import checkpoint as ckpt_lib
from tinynerf_tpu.utils.cli import cli
from tinynerf_tpu.utils.image_io import write_png


@dataclass
class MultiSceneConfig:
    scenes: int = 8
    size: int = 400  # image H = W
    poses_per_scene: int = 16
    iters: int = 2000
    n_rand: int = 1024  # rays per scene per step
    n_samples: int = 64
    lr: float = 5e-4
    near: float = 2.0
    far: float = 6.0
    num_freqs: int = 10
    hidden: int = 128
    log_every: int = 100
    seed: int = 0
    out_dir: str = "outputs/multiscene"
    ckpt_path: str = "checkpoints/multiscene.npz"
    data_dir: str = "data/multiscene"
    preview: bool = True
    model: str = "tinynerf"  # "tinynerf" | "nerf" (hierarchical+viewdirs)
    n_fine: int = 64  # fine samples per ray (nerf model)
    fused_train: bool = False  # fused Pallas fwd+bwd kernel per scene
    n_devices: Optional[int] = None


def _load_or_make_scene(cfg: MultiSceneConfig, k: int):
    from tinynerf_tpu.data import load_tiny_nerf_npz
    from tinynerf_tpu.synthetic import generate_synthetic_dataset

    path = f"{cfg.data_dir}/scene_{k:03d}_{cfg.size}.npz"
    if os.path.exists(path):
        return load_tiny_nerf_npz(path)
    d = generate_synthetic_dataset(
        n_poses=cfg.poses_per_scene, h=cfg.size, w=cfg.size, seed=k
    )
    os.makedirs(cfg.data_dir, exist_ok=True)
    np.savez(path, images=d["images"], poses=d["poses"], focal=d["focal"])
    return d


def main(cfg: MultiSceneConfig) -> dict:
    from tinynerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mesh = make_mesh(n_devices=cfg.n_devices)
    n_data, _ = mesh_axes(mesh)
    print(f"[mesh] {dict(mesh.shape)} devices={jax.devices()[:n_data]}")
    os.makedirs(cfg.out_dir, exist_ok=True)

    print(f"[data] generating/loading {cfg.scenes} scenes at {cfg.size}x{cfg.size}")
    t0 = time.time()
    scenes = [_load_or_make_scene(cfg, k) for k in range(cfg.scenes)]
    H = W = cfg.size
    focal = float(scenes[0]["focal"])
    images = jnp.asarray(np.stack([s["images"] for s in scenes]))  # (K,N,H,W,3)
    poses = jnp.asarray(np.stack([s["poses"] for s in scenes]))  # (K,N,4,4)
    print(f"[data] ready in {time.time() - t0:.1f}s; images {images.shape}")

    rays_o, rays_d = jax.vmap(lambda ps: get_rays_for_poses(H, W, focal, ps))(poses)
    pixels = images.reshape(cfg.scenes, cfg.poses_per_scene, H * W, 3)

    from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
    from tinynerf_tpu.ops.encoding import encoding_dim

    s = TrainSettings(
        n_rand=cfg.n_rand,
        n_samples=cfg.n_samples,
        near=cfg.near,
        far=cfg.far,
        num_freqs=cfg.num_freqs,
        lr=cfg.lr,
        # --hidden applies to both model families (for tinynerf the
        # default TrainSettings would otherwise silently ignore it).
        model_cfg=TinyNeRFConfig(
            in_dim=encoding_dim(cfg.num_freqs), hidden=cfg.hidden
        ),
    )
    loss = init_fn = ncfg = None
    if cfg.model == "nerf":
        from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf, make_hierarchical_loss

        ncfg = NeRFConfig(num_freqs=cfg.num_freqs, hidden=cfg.hidden)
        loss = make_hierarchical_loss(ncfg, n_fine=cfg.n_fine)
        init_fn = lambda k: init_nerf(k, ncfg)
    elif cfg.model != "tinynerf":
        raise ValueError(f"unknown model {cfg.model!r} (tinynerf|nerf)")
    params, opt_state = init_multiscene_state(
        jax.random.PRNGKey(cfg.seed), cfg.scenes, s, init_fn=init_fn
    )
    grad_fn = None
    if cfg.fused_train:
        if cfg.model == "nerf":
            from tinynerf_tpu.kernels.fused_nerf_train import make_fused_nerf_grad_fn

            grad_fn = make_fused_nerf_grad_fn(s, ncfg, n_fine=cfg.n_fine)
        else:
            from tinynerf_tpu.kernels.fused_train import make_fused_grad_fn

            grad_fn = make_fused_grad_fn(s)
        print("[train] fused Pallas fwd+bwd kernel enabled (vmapped over scenes)")
    block = make_multiscene_train_block(
        s, cfg.log_every, cfg.scenes, mesh, loss=loss, grad_fn=grad_fn
    )
    key = jax.random.PRNGKey(cfg.seed + 1)

    from tqdm import tqdm

    t0 = time.time()
    pbar = tqdm(total=cfg.iters, desc=f"train x{cfg.scenes} scenes")
    last = {}
    for b in range(0, cfg.iters, cfg.log_every):
        n = min(cfg.log_every, cfg.iters - b)
        if n != cfg.log_every:
            block = make_multiscene_train_block(s, n, cfg.scenes, mesh, loss=loss, grad_fn=grad_fn)
        params, opt_state, m = block(
            params, opt_state, key, jnp.int32(b), rays_o, rays_d, pixels
        )
        psnr = np.asarray(m["psnr"])[-1]
        last = {"psnr_mean": float(psnr.mean()), "psnr_min": float(psnr.min())}
        pbar.update(n)
        pbar.set_postfix(**last)
    pbar.close()
    dt = time.time() - t0
    total_rays = cfg.iters * cfg.n_rand * cfg.scenes
    print(
        f"[done] {cfg.iters} iters x {cfg.scenes} scenes in {dt:.1f}s "
        f"({total_rays / dt:,.0f} rays/s aggregate)"
    )

    ckpt_lib.save_checkpoint(
        cfg.ckpt_path,
        params,
        opt_state,
        cfg.iters,
        meta={"scenes": cfg.scenes, "size": cfg.size, "model": f"{cfg.model}-multiscene"},
    )
    if cfg.preview:
        if cfg.model == "nerf":
            from tinynerf_tpu.render import make_hierarchical_image_renderer

            renderer = make_hierarchical_image_renderer(
                H=H, W=W, focal=focal, chunk=4096, n_coarse=cfg.n_samples,
                n_fine=cfg.n_fine, near=cfg.near, far=cfg.far, nerf_cfg=ncfg,
            )
        else:
            renderer = make_image_renderer(
                H=H, W=W, focal=focal, chunk=8192, n_samples=cfg.n_samples,
                near=cfg.near, far=cfg.far, num_freqs=cfg.num_freqs,
            )
        for k in range(min(cfg.scenes, 4)):
            img = renderer(scene_params(params, k), poses[k][0])
            write_png(f"{cfg.out_dir}/scene_{k:03d}.png", np.asarray(img))
        print(f"[preview] wrote {min(cfg.scenes, 4)} previews to {cfg.out_dir}")
    return {"rays_per_sec": total_rays / dt, **last}


if __name__ == "__main__":
    main(cli(MultiSceneConfig, description="Batched multi-scene TinyNeRF training"))
