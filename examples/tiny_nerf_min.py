"""Single-file TinyNeRF on TPU — the whole pipeline in one runnable script.

The reference ships a monolithic tutorial variant (tiny_nerf_min.py)
whose train() is defined but never invoked (no __main__ guard — running
it only builds the model and exits; see SURVEY.md section 2 #14). This
framework's single-file variant actually trains.

Deliberately self-contained: it uses only the framework's public ops
(one import block), hard-codes the tutorial config like the reference
does (ITERS=8000, N_RAND=2048, N_SAMPLES=64, LR=5e-4), logs every 100
steps, previews every 1000, and saves a model-only checkpoint.

Run: python examples/tiny_nerf_min.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.data import ensure_data
from tinynerf_tpu.models.tinynerf import TinyNeRFConfig, init_tinynerf
from tinynerf_tpu.ops.rays import get_rays_for_poses
from tinynerf_tpu.render import make_image_renderer
from tinynerf_tpu.training import TrainSettings, init_train_state, make_train_block
from tinynerf_tpu.utils.image_io import write_png

# ---- tutorial config (matches the reference's module constants) ----
ITERS = 8000
N_RAND = 2048
N_SAMPLES = 64
NEAR, FAR = 2.0, 6.0
LR = 5e-4
LOG_EVERY = 100
PREVIEW_EVERY = 1000
SEED = 0
OUT_DIR = "outputs"
CKPT = "checkpoints/tiny_nerf_min.npz"


def train() -> None:
    print(f"[device] {jax.devices()}")
    d = ensure_data()
    images = jnp.asarray(d["images"])
    poses = jnp.asarray(d["poses"])
    focal = float(d["focal"])
    n_images, H, W, _ = images.shape
    print(f"[data] N={n_images} H={H} W={W} focal={focal:.2f}")

    settings = TrainSettings(
        n_rand=N_RAND, n_samples=N_SAMPLES, near=NEAR, far=FAR, lr=LR
    )
    params, opt_state = init_train_state(jax.random.PRNGKey(SEED), settings)
    rays_o, rays_d = get_rays_for_poses(H, W, focal, poses)
    pixels = images.reshape(n_images, H * W, 3)

    block = make_train_block(settings, LOG_EVERY)
    renderer = make_image_renderer(
        H=H, W=W, focal=focal, n_samples=N_SAMPLES, near=NEAR, far=FAR
    )
    key = jax.random.PRNGKey(SEED)

    os.makedirs(OUT_DIR, exist_ok=True)
    t0 = time.time()
    for start in range(0, ITERS, LOG_EVERY):
        params, opt_state, m = block(
            params, opt_state, key, jnp.int32(start), rays_o, rays_d, pixels
        )
        step = start + LOG_EVERY
        print(
            f"step {step:5d}  loss {float(m['loss'][-1]):.5f}  "
            f"psnr {float(m['psnr'][-1]):.2f}"
        )
        if step % PREVIEW_EVERY == 0:
            img = renderer(params, poses[step % n_images])
            write_png(f"{OUT_DIR}/min_preview_{step:06d}.png", np.asarray(img))
    dt = time.time() - t0
    print(f"[done] {ITERS} iters in {dt / 60:.2f} min ({ITERS * N_RAND / dt:,.0f} rays/s)")

    # Model-only checkpoint (matches the min variant's schema choice).
    leaves, treedef = jax.tree_util.tree_flatten(params)
    os.makedirs(os.path.dirname(CKPT), exist_ok=True)
    np.savez(CKPT, **{f"param_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    print(f"[ckpt] saved model-only checkpoint to {CKPT}")


if __name__ == "__main__":
    train()
