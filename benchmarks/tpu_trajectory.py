"""TPU-trainer twin of benchmarks/torch_trainer.py — the other half of
the training-dynamics parity proof.

Same synthetic npz, same recipe (2048 rays x 64 samples, Adam 5e-4,
one image per step cycling modulo the train set, jittered stratified
samples, white background, holdout=4), same held-out evaluation
(full-image renders at deterministic depths, PSNR per view). RNG
streams necessarily differ (torch global seed vs jax explicit keys;
SURVEY.md "Numerical-fidelity notes"), so parity is statistical:
held-out PSNR at matching step counts should agree to within the
run-to-run noise of the stochastic ray draws (~0.3 dB).

Run:  python -u -m benchmarks.tpu_trajectory          (XLA path)
      python -u -m benchmarks.tpu_trajectory --fused  (Pallas kernel —
      also the fused-vs-XLA training-quality check, VERDICT item 3b)
-> benchmarks/tpu_trajectory.json / tpu_trajectory_fused.json, and the
side-by-side table in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import time


def run(
    iters: int = 2000,
    eval_every: int = 500,
    holdout: int = 4,
    fused: bool = False,
    data_path: str = "data/synthetic_tiny_nerf.npz",
    out_path: str = "",
) -> list:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinynerf_tpu.config import Config
    from tinynerf_tpu.data import ensure_data
    from tinynerf_tpu.evaluation import evaluate_views
    from tinynerf_tpu.ops.rays import get_rays_for_poses
    from tinynerf_tpu.render import make_image_renderer
    from tinynerf_tpu.training import init_train_state, make_train_block
    from tinynerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if not out_path:
        out_path = (
            "benchmarks/tpu_trajectory_fused.json"
            if fused
            else "benchmarks/tpu_trajectory.json"
        )

    cfg = Config(holdout=holdout, data_path=data_path)
    d = ensure_data(cfg.data_path, allow_synthetic=True)
    images = jnp.asarray(d["images"])
    poses = jnp.asarray(d["poses"])
    focal = float(d["focal"])
    n_images, H, W, _ = images.shape
    n_train = n_images - holdout

    settings = cfg.train_settings()
    params, opt_state = init_train_state(jax.random.PRNGKey(cfg.seed), settings)
    rays_o_all, rays_d_all = get_rays_for_poses(H, W, focal, poses)
    pixels = images.reshape(n_images, H * W, 3)
    data = (rays_o_all[:n_train], rays_d_all[:n_train], pixels[:n_train])

    grad_fn = None
    if fused:
        from tinynerf_tpu.kernels.fused_train import make_fused_grad_fn

        grad_fn = make_fused_grad_fn(settings)
    block = make_train_block(settings, eval_every, grad_fn=grad_fn)
    renderer = make_image_renderer(
        H=H, W=W, focal=focal, chunk=cfg.chunk, n_samples=cfg.n_samples,
        near=cfg.near, far=cfg.far, num_freqs=cfg.num_freqs,
        model_cfg=cfg.model_cfg(),
    )

    key = jax.random.PRNGKey(cfg.seed)
    trajectory = []
    t_start = time.time()
    for step0 in range(0, iters, eval_every):
        params, opt_state, m = block(
            params, opt_state, key, jnp.int32(step0), *data
        )
        loss = float(np.asarray(m["loss"])[-1])
        ev = evaluate_views(
            renderer, params, images, poses, list(range(n_train, n_images))
        )
        rec = {
            "step": step0 + eval_every,
            "heldout_psnr_mean": round(ev["psnr_mean"], 3),
            "heldout_psnr_per_view": ev["per_view"],
            "train_loss": round(loss, 6),
            "elapsed_s": round(time.time() - t_start, 1),
        }
        trajectory.append(rec)
        print(json.dumps(rec), flush=True)
        with open(out_path, "w") as f:
            json.dump(
                {
                    "recipe": f"{cfg.n_rand} rays x {cfg.n_samples} samples, "
                    f"Adam 5e-4, holdout={holdout}, "
                    + ("fused Pallas kernel" if fused else "XLA jit path"),
                    "data": data_path,
                    "trajectory": trajectory,
                },
                f,
                indent=1,
            )
    return trajectory


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--fused", action="store_true")
    a = ap.parse_args()
    run(iters=a.iters, eval_every=a.eval_every, fused=a.fused)
