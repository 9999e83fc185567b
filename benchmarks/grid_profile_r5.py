"""Round-5 grid-family attribution (VERDICT r4 weak #6 / item 4).

The grid family trains at ~15.6k rays/s — 43x below the unfused XLA
TinyNeRF path — while DESIGN.md 4f's "gather-bound" claim implied HBM
limits that the arithmetic contradicts (achieved gather traffic ~0.5
GB/s vs an ~800 GB/s part). This script attributes the step time ON
CHIP, each stage inside one jitted lax.scan with a loop-carried
dependency (CLAUDE.md: loop-invariant scan bodies get hoisted and
measure one run):

  train_full    the production train block (scan of 20 steps)
  loss_fwd      forward loss only (no backward)
  encode_fwd    grid_encode alone, forward
  encode_grad   grid_encode forward+backward (isolates gather+scatter)
  mlp_train     the same train step with tables replaced by one 3->F
                matmul encoder (everything EXCEPT the tables)

plus two XLA-level candidate fixes measured side by side:

  encode_fwd_pib / encode_grad_pib    jnp.take(mode="promise_in_bounds")
       (indices are in range by construction: dense ids are clamped,
        hashed ids are masked) — drops the OOB select/guard XLA emits
        for the default "fill" mode on both the gather AND its
        transpose scatter.
  encode_fwd_cat / encode_grad_cat    all levels' tables concatenated
       into ONE (sum_T, F) buffer, all corners gathered by ONE take
       (removes the 8-level op serialization).

Writes benchmarks/r5/grid_profile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.utils.cache import enable_compilation_cache
from tinynerf_tpu.utils.platform import honor_platform_env

honor_platform_env()
enable_compilation_cache()

from tinynerf_tpu.models.grid_nerf import (
    GridNeRFConfig,
    _CORNERS,
    _HASH_PRIMES,
    grid_encode,
    init_grid_nerf,
    make_grid_loss,
)
from tinynerf_tpu.training import TrainSettings, init_train_state, make_train_block

P = int(os.environ.get("GRID_PROFILE_P", 2048 * 64))  # points/step
REPS = int(os.environ.get("GRID_PROFILE_REPS", 30))  # scan len/dispatch


def _sync(x):
    return np.asarray(x)


def _time(fn, *args):
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _scan_points(body, pts0):
    """Scan REPS invocations of body(pts) -> scalar, threading the
    scalar back into the points (true loop-carried dependency)."""

    def step(c, _):
        s = body(pts0 + c * 1e-30)
        return s, ()

    return jax.jit(lambda c: jax.lax.scan(step, c, None, length=REPS)[0])


def _level_ids(u, res, dense, table_size):
    xs = u * res
    i0 = jnp.minimum(jnp.floor(xs).astype(jnp.int32), res - 1)
    f = xs - i0.astype(jnp.float32)
    ids = i0[:, None, :] + jnp.asarray(_CORNERS)[None, :, :]
    if dense:
        side = res + 1
        lin = (ids[..., 0] * side + ids[..., 1]) * side + ids[..., 2]
    else:
        h = ids.astype(jnp.uint32)
        lin = (
            h[..., 0] * np.uint32(_HASH_PRIMES[0])
            ^ h[..., 1] * np.uint32(_HASH_PRIMES[1])
            ^ h[..., 2] * np.uint32(_HASH_PRIMES[2])
        ) & np.uint32(table_size - 1)
        lin = lin.astype(jnp.int32)
    cb = jnp.asarray(_CORNERS)[None].astype(jnp.float32)
    w = jnp.prod(cb * f[:, None, :] + (1 - cb) * (1 - f[:, None, :]), axis=-1)
    return lin, w


def _take(t, lin, mode):
    if mode == "promise_in_bounds":
        # jnp.take rejects this mode; .at[].get exposes the full
        # GatherScatterMode set (PROMISE_IN_BOUNDS drops the OOB guard
        # on the gather AND its transpose scatter).
        return t.at[lin].get(mode="promise_in_bounds")
    return jnp.take(t, lin, axis=0)


def grid_encode_variant(tables, pts, cfg, mode="fill", concat=False):
    lo = jnp.asarray(cfg.aabb[:3], jnp.float32)
    hi = jnp.asarray(cfg.aabb[3:], jnp.float32)
    u = jnp.clip((pts.astype(jnp.float32) - lo) / (hi - lo), 0.0, 1.0)
    res_dense = list(zip(cfg.level_resolutions(), cfg.level_is_dense()))
    if concat:
        # One big table + one gather for every level and corner.
        big = jnp.concatenate([tables[f"l{l}"] for l in range(cfg.n_levels)], 0)
        offs, off = [], 0
        for l, t in enumerate(cfg.level_table_sizes()):
            offs.append(off)
            off += t
        lins, ws = [], []
        for l, (res, dense) in enumerate(res_dense):
            lin, w = _level_ids(u, res, dense, cfg.table_size)
            lins.append(lin + offs[l])
            ws.append(w)
        lin_all = jnp.stack(lins, 1)  # (N, L, 8)
        w_all = jnp.stack(ws, 1)  # (N, L, 8)
        feats = _take(big, lin_all, mode)  # (N, L, 8, F)
        return jnp.sum(w_all[..., None] * feats, axis=2).reshape(pts.shape[0], -1)
    outs = []
    for l, (res, dense) in enumerate(res_dense):
        lin, w = _level_ids(u, res, dense, cfg.table_size)
        feats = _take(tables[f"l{l}"], lin, mode)
        outs.append(jnp.sum(w[..., None] * feats, axis=1))
    return jnp.concatenate(outs, axis=-1)


def main():
    out = {"platform": jax.default_backend(), "points_per_step": P,
           "scan_reps": REPS}
    gcfg = GridNeRFConfig(aabb=(-4, -4, -4, 4, 4, 4))
    s = TrainSettings(n_rand=2048, n_samples=64)
    key = jax.random.PRNGKey(0)
    params = init_grid_nerf(key, gcfg)
    tables = params["tables"]
    pts0 = jax.random.uniform(key, (P, 3), jnp.float32, -3.5, 3.5)
    rnd = jax.random.normal(jax.random.fold_in(key, 1),
                            (P, gcfg.n_levels * gcfg.features))

    n_gathers = P * 8 * gcfg.n_levels
    out["gathers_per_step"] = n_gathers
    out["gather_bytes_per_step"] = n_gathers * gcfg.features * 4

    # --- encode forward variants ---
    for name, kw in [
        ("encode_fwd", {}),
        ("encode_fwd_pib", dict(mode="promise_in_bounds")),
        ("encode_fwd_cat", dict(concat=True)),
        ("encode_fwd_cat_pib", dict(concat=True, mode="promise_in_bounds")),
    ]:
        fn = _scan_points(
            lambda p, kw=kw: jnp.sum(
                grid_encode_variant(tables, p, gcfg, **kw) * rnd
            ),
            pts0,
        )
        dt = _time(fn, jnp.float32(0.0)) / REPS
        out[name + "_ms"] = round(dt * 1e3, 3)
        out[name + "_gather_gbps"] = round(
            out["gather_bytes_per_step"] / dt / 1e9, 2
        )
        print(f"[profile] {name}: {out[name + '_ms']} ms "
              f"({out[name + '_gather_gbps']} GB/s gather)", flush=True)

    # Parity guard: variants must agree with the production encoder.
    ref = grid_encode(tables, pts0[:4096], gcfg)
    for kw in [dict(mode="promise_in_bounds"), dict(concat=True),
               dict(concat=True, mode="promise_in_bounds")]:
        v = grid_encode_variant(tables, pts0[:4096], gcfg, **kw)
        err = float(jnp.max(jnp.abs(ref - v)))
        assert err < 1e-6, (kw, err)
    out["variant_parity_max_err"] = "< 1e-6 (all variants, 4096 pts)"

    # --- encode forward+backward (gather + transpose scatter) ---
    for name, kw in [
        ("encode_grad", {}),
        ("encode_grad_pib", dict(mode="promise_in_bounds")),
        ("encode_grad_cat", dict(concat=True)),
        ("encode_grad_cat_pib", dict(concat=True, mode="promise_in_bounds")),
    ]:
        def gbody(p, kw=kw):
            g = jax.grad(
                lambda t: jnp.sum(grid_encode_variant(t, p, gcfg, **kw) * rnd)
            )(tables)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        dt = _time(_scan_points(gbody, pts0), jnp.float32(0.0)) / REPS
        out[name + "_ms"] = round(dt * 1e3, 3)
        print(f"[profile] {name}: {out[name + '_ms']} ms", flush=True)

    # --- full loss forward (encode + MLP + composite), no backward ---
    loss = make_grid_loss(gcfg)
    ro = jax.random.normal(key, (2048, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 2), (2048, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    tgt = jax.random.uniform(jax.random.fold_in(key, 3), (2048, 3))

    def fwd_body(c, _):
        l, _m = loss(params, ro + c * 1e-30, rd, tgt, jax.random.PRNGKey(0), s)
        return l, ()

    dt = _time(
        jax.jit(lambda c: jax.lax.scan(fwd_body, c, None, length=REPS)[0]),
        jnp.float32(0.0),
    ) / REPS
    out["loss_fwd_ms"] = round(dt * 1e3, 3)
    print(f"[profile] loss_fwd: {out['loss_fwd_ms']} ms", flush=True)

    # --- full production train step (fwd+bwd+Adam), and the MLP-only
    # twin where the tables are replaced by one 3->feat matmul ---
    def run_block(loss_fn, prm):
        prm, opt = init_train_state(
            jax.random.PRNGKey(0), s, init_fn=lambda k: prm
        )
        block = make_train_block(s, 20, loss=loss_fn)
        n_img, hw = 4, 32 * 32
        kk = jax.random.PRNGKey(9)
        ro_all = jax.random.normal(kk, (n_img, hw, 3)) * 0.1
        rd_all = jax.random.normal(jax.random.fold_in(kk, 1), (n_img, hw, 3))
        rd_all = rd_all / jnp.linalg.norm(rd_all, axis=-1, keepdims=True)
        px = jax.random.uniform(jax.random.fold_in(kk, 2), (n_img, hw, 3))
        args = (jax.random.PRNGKey(1), jnp.int32(0), ro_all, rd_all, px)
        prm, opt, m = block(prm, opt, *args)
        _sync(m["loss"])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            prm, opt, m = block(prm, opt, *args)
            _sync(m["loss"])
            best = min(best, time.perf_counter() - t0)
        return best / 20

    dt = run_block(loss, init_grid_nerf(jax.random.PRNGKey(0), gcfg))
    out["train_full_ms"] = round(dt * 1e3, 3)
    out["train_full_rays_per_s"] = round(2048 / dt, 1)
    print(f"[profile] train_full: {out['train_full_ms']} ms "
          f"({out['train_full_rays_per_s']} rays/s)", flush=True)

    # The candidate strategies as the PRODUCTION path end to end (the
    # encode_* micro-sections above isolate the op; these decide the
    # models/grid_nerf.GridNeRFConfig.encode_impl default).
    import dataclasses as _dc0

    for impl in ("cat", "cat_pib"):
        gcfg_v = _dc0.replace(gcfg, encode_impl=impl)
        dt = run_block(
            make_grid_loss(gcfg_v), init_grid_nerf(jax.random.PRNGKey(0), gcfg_v)
        )
        out[f"train_full_{impl}_ms"] = round(dt * 1e3, 3)
        out[f"train_full_{impl}_rays_per_s"] = round(2048 / dt, 1)
        print(f"[profile] train_full_{impl}: {out[f'train_full_{impl}_ms']} ms "
              f"({out[f'train_full_{impl}_rays_per_s']} rays/s)", flush=True)

    # MLP-only twin: identical step with the gather encoder swapped for
    # a dense projection (same feature width).
    import dataclasses as _dc

    from tinynerf_tpu.models import grid_nerf as gn

    feat_dim = gcfg.n_levels * gcfg.features
    wenc = jax.random.normal(jax.random.fold_in(key, 7), (3, feat_dim)) * 0.1
    prm0 = init_grid_nerf(jax.random.PRNGKey(0), gcfg)

    def mlp_loss(prm, ro_, rd_, t_, k_, s_, noise_scale=1.0):
        from tinynerf_tpu.ops.sampling import stratified_samples
        from tinynerf_tpu.ops.volume import volume_render
        from tinynerf_tpu.ops.encoding import positional_encoding
        from tinynerf_tpu.utils.metrics import mse2psnr

        z, pts = stratified_samples(s_.near, s_.far, s_.n_samples, ro_, rd_,
                                    randomized=True, key=k_)
        feat = pts.reshape(-1, 3) @ wenc  # <- the only change vs grid
        mlp = prm["mlp"]
        dtc = gcfg.compute_dtype
        h = jnp.maximum(gn._dense_layer(feat, mlp["geo0"], dtc), 0)
        geo = gn._dense_layer(h, mlp["geo1"], dtc).astype(jnp.float32)
        sig = jax.nn.relu(geo[:, 0])
        dirs = rd_ / jnp.linalg.norm(rd_, axis=-1, keepdims=True)
        de = positional_encoding(dirs, num_freqs=gcfg.num_freqs_dir)
        de = jnp.repeat(de, s_.n_samples, axis=0)
        c = jnp.concatenate([geo[:, 1:], de], axis=-1)
        c = jnp.maximum(gn._dense_layer(c, mlp["rgb0"], dtc), 0)
        c = jnp.maximum(gn._dense_layer(c, mlp["rgb1"], dtc), 0)
        rgb = jax.nn.sigmoid(gn._dense_layer(c, mlp["rgb2"], dtc).astype(jnp.float32))
        comp, _, _, _ = volume_render(
            rgb.reshape(-1, s_.n_samples, 3), sig.reshape(-1, s_.n_samples),
            z, rd_, white_bkgd=s_.white_bkgd)
        l = jnp.mean((comp - t_.astype(jnp.float32)) ** 2)
        return l, {"loss": l, "psnr": mse2psnr(l)}

    dt = run_block(mlp_loss, prm0)
    out["mlp_train_ms"] = round(dt * 1e3, 3)
    print(f"[profile] mlp_train (no tables): {out['mlp_train_ms']} ms", flush=True)

    os.makedirs("benchmarks/r5", exist_ok=True)
    with open("benchmarks/r5/grid_profile.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
