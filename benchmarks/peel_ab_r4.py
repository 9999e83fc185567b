"""Peel-last-block A/B for the streamed fused NeRF train kernel
(VERDICT r4 item 4: one documented kernel-level win with before/after).

peel_last_block skips the backward stream's first rematerialization —
the forward stream's last block is still in VMEM scratch. Analytic
saving ~1/(4*NB) of matmul work: ~10% at the flagship fine pass
(union 192, block 96, NB=2), ~5% at the streamed S=512 path (NB=4).

Two measurements per shape, peel off vs on:
  raw    — the streamed grads kernel alone, 50 invocations per
           dispatch in a lax.scan (output threaded into input so the
           body cannot be hoisted — CLAUDE.md timing rules).
  train  — the full shipped train block (coarse + pdf + fine + adam),
           so the kernel-level win is also reported as end-to-end
           rays/s on the flagship recipe.

Prints one JSON line; writes benchmarks/r4/peel_ab.json. Run on the
TPU; CPU (interpret) exercises wiring only.
"""

from __future__ import annotations

import dataclasses
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
    from tinynerf_tpu.kernels.fused_nerf_stream import (
        fused_nerf_pass_grads_streamed,
    )
    from tinynerf_tpu.kernels.fused_nerf_train import make_fused_nerf_grad_fn
    from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf, init_nerf_mlp
    from tinynerf_tpu.training import init_train_state, make_train_block

    on_tpu = jax.default_backend() == "tpu"
    R = 2048 if on_tpu else 64
    n_scan = 50 if on_tpu else 2
    n_block = 10 if on_tpu else 2
    reps = 3 if on_tpu else 1
    ncfg = NeRFConfig(compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    key = jax.random.PRNGKey(0)
    ro = jax.random.normal(key, (R, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 1), (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    tgt = jax.random.uniform(jax.random.fold_in(key, 2), (R, 3))

    out: dict = {"platform": jax.default_backend()}

    # --- raw streamed kernel: (S, SB) shapes of the two shipped paths ---
    shapes = ((192, 96), (512, 128)) if on_tpu else ((16, 8),)
    for S, SB in shapes:
        z = jnp.sort(
            jax.random.uniform(
                jax.random.fold_in(key, 3), (R, S), minval=2.0, maxval=6.0
            ),
            axis=-1,
        )
        mlp = init_nerf_mlp(jax.random.PRNGKey(0), ncfg)
        row: dict = {}
        for peel in (False, True):
            tag = "peel" if peel else "base"
            try:
                def body(c, _):
                    l, _g = fused_nerf_pass_grads_streamed(
                        mlp, ro + c * 1e-30, rd, tgt, z,
                        cfg=ncfg, sample_block=SB, peel_last_block=peel,
                    )
                    return l, l

                f = jax.jit(
                    lambda c: jax.lax.scan(body, c, None, length=n_scan)[1]
                )
                np.asarray(f(jnp.float32(0.0)))
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    np.asarray(f(jnp.float32(0.0)))
                    best = min(best, time.perf_counter() - t0)
                row[tag] = round(R * n_scan / best, 1)
            except Exception as e:  # noqa: BLE001 — Mosaic limits expected
                row[tag] = f"error: {type(e).__name__}: {e}"[:160]
            print(f"[peel_ab] raw S={S} SB={SB} {tag}: {row[tag]}", flush=True)
        if isinstance(row.get("base"), float) and isinstance(
            row.get("peel"), float
        ):
            row["speedup"] = round(row["peel"] / row["base"], 4)
        out[f"raw_s{S}"] = row

    # --- shipped train block (flagship recipe shape) ---
    cfg = Config(bf16=on_tpu)
    settings = dataclasses.replace(
        cfg.train_settings(), n_rand=R, n_samples=64 if on_tpu else 8
    )
    n_fine = 128 if on_tpu else 8
    data_o, data_d, data_p = ro[None], rd[None], tgt[None]
    row = {}
    for peel in (False, True):
        tag = "peel" if peel else "base"
        try:
            grad_fn = make_fused_nerf_grad_fn(
                settings, ncfg, n_fine=n_fine,
                sample_block=None if on_tpu else 8,
                peel_last_block=peel,
            )
            p0, o0 = init_train_state(
                jax.random.PRNGKey(0), settings,
                init_fn=lambda k: init_nerf(k, ncfg),
            )
            block = make_train_block(settings, n_block, grad_fn=grad_fn)
            p0, o0, m = block(
                p0, o0, key, jnp.int32(0), data_o, data_d, data_p
            )
            np.asarray(m["loss"])
            best = float("inf")
            for _ in range(reps):
                p1, o1 = init_train_state(
                    jax.random.PRNGKey(0), settings,
                    init_fn=lambda k: init_nerf(k, ncfg),
                )
                t0 = time.perf_counter()
                p1, o1, m = block(
                    p1, o1, key, jnp.int32(n_block), data_o, data_d, data_p
                )
                np.asarray(m["loss"])
                best = min(best, time.perf_counter() - t0)
            row[tag] = round(R * n_block / best, 1)
        except Exception as e:  # noqa: BLE001
            row[tag] = f"error: {type(e).__name__}: {e}"[:160]
        print(f"[peel_ab] train {tag}: {row[tag]}", flush=True)
    if isinstance(row.get("base"), float) and isinstance(row.get("peel"), float):
        row["speedup"] = round(row["peel"] / row["base"], 4)
    out["train_flagship"] = row

    os.makedirs("benchmarks/r4", exist_ok=True)
    with open("benchmarks/r4/peel_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
