"""Ray-tile-size sweep for the fused kernels (VERDICT r4 item 4: lift
the worst-MFU hot path). TR=128 was chosen in round 1 without a sweep;
larger tiles amortize weight fetches and per-tile vector overhead over
more MXU rows (at the cost of VMEM), smaller ones pipeline better.

Prints one JSON line: {kernel: {TR: rays_per_sec | "error: ..."}}.
Run on the TPU; CPU (interpret) exercises correctness only.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tinynerf_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax
    import jax.numpy as jnp

    from tinynerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from tinynerf_tpu.config import Config
    from tinynerf_tpu.kernels.fused_render import fused_render_rays
    from tinynerf_tpu.kernels.fused_train import make_fused_grad_fn
    from tinynerf_tpu.models.tinynerf import init_tinynerf
    from tinynerf_tpu.training import init_train_state, make_train_block

    on_tpu = jax.default_backend() == "tpu"
    R = 8192 if on_tpu else 256
    n_iters = 200 if on_tpu else 2
    reps = 3 if on_tpu else 1
    tile_sizes = (64, 128, 256, 512) if on_tpu else (64, 128)

    # f32 on CPU: the CPU backend has no bf16 dot kernels.
    cfg = Config(bf16=on_tpu)
    settings = cfg.train_settings()
    key = jax.random.PRNGKey(0)
    ro = jax.random.normal(key, (R, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 1), (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    tgt = jax.random.uniform(jax.random.fold_in(key, 2), (R, 3))
    params = init_tinynerf(jax.random.PRNGKey(0), settings.model_cfg)

    # Stamp the backend so a CPU-smoke artifact can never be mistaken
    # for chip data (a partial CPU run of this file was once committed
    # as if it were a TPU sweep).
    out: dict = {
        "platform": jax.default_backend(),
        "render_scan": {},
        "train_step": {},
    }

    # --- fused render, n_iters loop-carried invocations per dispatch ---
    for tr in tile_sizes:
        try:
            def body(c, _):
                o = fused_render_rays(
                    params, ro + c * 1e-30, rd, n_samples=64, tile_r=tr
                )
                return o[0, 0], o[0, 0]

            f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n_iters)[1])
            np.asarray(f(jnp.float32(0.0)))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(f(jnp.float32(0.0)))
                best = min(best, time.perf_counter() - t0)
            out["render_scan"][tr] = round(R * n_iters / best, 1)
        except Exception as e:  # noqa: BLE001 — VMEM/Mosaic limits expected
            out["render_scan"][tr] = f"error: {type(e).__name__}: {e}"[:160]
        print(f"[sweep] render TR={tr}: {out['render_scan'][tr]}", flush=True)

    # --- fused train step (grad+adam), block of 20 steps per dispatch ---
    import dataclasses

    big = dataclasses.replace(settings, n_rand=R)
    data_o = ro[None]
    data_d = rd[None]
    data_p = tgt[None]
    for tr in tile_sizes:
        try:
            p0, o0 = init_train_state(jax.random.PRNGKey(0), big)
            block = make_train_block(
                big, 20, grad_fn=make_fused_grad_fn(big, tile_r=tr)
            )
            p0, o0, m = block(p0, o0, key, jnp.int32(0), data_o, data_d, data_p)
            np.asarray(m["loss"])
            best = float("inf")
            for _ in range(reps):
                p1, o1 = init_train_state(jax.random.PRNGKey(0), big)
                t0 = time.perf_counter()
                p1, o1, m = block(p1, o1, key, jnp.int32(20), data_o, data_d, data_p)
                np.asarray(m["loss"])
                best = min(best, time.perf_counter() - t0)
            out["train_step"][tr] = round(R * 20 / best, 1)
        except Exception as e:  # noqa: BLE001
            out["train_step"][tr] = f"error: {type(e).__name__}: {e}"[:160]
        print(f"[sweep] train TR={tr}: {out['train_step'][tr]}", flush=True)

    # --- hierarchical NeRF train (coarse+fine fused), tile_r sweep ---
    # At TR>=256 the fine union's activation scratch exceeds the
    # monolithic budget and auto-routes to the streamed kernel — the
    # sweep thus also compares monolithic vs streamed at equal shapes.
    from tinynerf_tpu.kernels.fused_nerf_train import make_fused_nerf_grad_fn
    from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf

    ncfg = NeRFConfig(
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32
    )
    out["nerf_train"] = {}
    for tr in tile_sizes:
        try:
            p0, o0 = init_train_state(
                jax.random.PRNGKey(0), big, init_fn=lambda k: init_nerf(k, ncfg)
            )
            block = make_train_block(
                big, 10,
                grad_fn=make_fused_nerf_grad_fn(big, ncfg, n_fine=128, tile_r=tr),
            )
            p0, o0, m = block(p0, o0, key, jnp.int32(0), data_o, data_d, data_p)
            np.asarray(m["loss"])
            best = float("inf")
            for _ in range(reps):
                p1, o1 = init_train_state(
                    jax.random.PRNGKey(0), big, init_fn=lambda k: init_nerf(k, ncfg)
                )
                t0 = time.perf_counter()
                p1, o1, m = block(p1, o1, key, jnp.int32(10), data_o, data_d, data_p)
                np.asarray(m["loss"])
                best = min(best, time.perf_counter() - t0)
            out["nerf_train"][tr] = round(R * 10 / best, 1)
        except Exception as e:  # noqa: BLE001
            out["nerf_train"][tr] = f"error: {type(e).__name__}: {e}"[:160]
        print(f"[sweep] nerf TR={tr}: {out['nerf_train'][tr]}", flush=True)

    # --- streamed S=512 fine union: sample_block sweep at TR=128 ---
    out["nerf_s512_block"] = {}
    for sb in ((64, 128, 256) if on_tpu else (16,)):
        try:
            nf = 448 if on_tpu else 16
            sbig = dataclasses.replace(big, n_samples=64 if on_tpu else 16)
            p0, o0 = init_train_state(
                jax.random.PRNGKey(0), sbig, init_fn=lambda k: init_nerf(k, ncfg)
            )
            block = make_train_block(
                sbig, 10,
                grad_fn=make_fused_nerf_grad_fn(
                    sbig, ncfg, n_fine=nf, sample_block=sb
                ),
            )
            p0, o0, m = block(p0, o0, key, jnp.int32(0), data_o, data_d, data_p)
            np.asarray(m["loss"])
            best = float("inf")
            for _ in range(reps):
                p1, o1 = init_train_state(
                    jax.random.PRNGKey(0), sbig, init_fn=lambda k: init_nerf(k, ncfg)
                )
                t0 = time.perf_counter()
                p1, o1, m = block(p1, o1, key, jnp.int32(10), data_o, data_d, data_p)
                np.asarray(m["loss"])
                best = min(best, time.perf_counter() - t0)
            out["nerf_s512_block"][sb] = round(R * 10 / best, 1)
        except Exception as e:  # noqa: BLE001
            out["nerf_s512_block"][sb] = f"error: {type(e).__name__}: {e}"[:160]
        print(f"[sweep] s512 SB={sb}: {out['nerf_s512_block'][sb]}", flush=True)

    os.makedirs("benchmarks/r4", exist_ok=True)
    with open("benchmarks/r4/tile_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
