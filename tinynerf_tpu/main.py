"""Smoke test: render one pose with an untrained model.

Parity with the reference `src/main.py:36-65`: prints device/version and
data shapes, renders pose 0 (chunk 8192, 64 samples, near 2, far 6),
writes outputs/preview.png, and reports the render wall-clock — a fast
end-to-end check that the TPU, the data, and the whole pipeline wiring
work before committing to a training run.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.config import Config
from tinynerf_tpu.data import ensure_data
from tinynerf_tpu.render import make_image_renderer
from tinynerf_tpu.training import init_train_state
from tinynerf_tpu.utils.cli import cli
from tinynerf_tpu.utils.image_io import write_png


def main(cfg: Config = Config()) -> None:
    from tinynerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"[device] {jax.devices()} jax={jax.__version__}")
    d = ensure_data(cfg.data_path, allow_synthetic=cfg.allow_synthetic)
    images = np.asarray(d["images"])
    poses = jnp.asarray(d["poses"])
    focal = float(d["focal"])
    n_images, H, W, _ = images.shape
    print(
        f"[data] N={n_images} H={H} W={W} focal={focal:.2f}"
        + (" (synthetic)" if d.get("synthetic") else "")
    )

    params, _ = init_train_state(jax.random.PRNGKey(cfg.seed), cfg.train_settings())
    renderer = make_image_renderer(
        H=H,
        W=W,
        focal=focal,
        chunk=cfg.chunk,
        n_samples=cfg.n_samples,
        near=cfg.near,
        far=cfg.far,
        num_freqs=cfg.num_freqs,
        model_cfg=cfg.model_cfg(),
        use_fused=cfg.fused,
    )

    os.makedirs(cfg.out_dir, exist_ok=True)
    t0 = time.time()
    img = np.asarray(renderer(params, poses[0]))  # includes compile
    t_compile = time.time() - t0
    t0 = time.time()
    img = np.asarray(renderer(params, poses[0]))
    dt = time.time() - t0
    out_path = f"{cfg.out_dir}/preview.png"
    write_png(out_path, img)
    print(
        f"[render] wrote {out_path} in {dt:.3f}s steady-state "
        f"({t_compile:.2f}s with compile; untrained model; expect a hazy image)"
    )


if __name__ == "__main__":
    main(cli(Config, description="TinyNeRF TPU smoke test"))
