"""Multi-resolution grid-encoded NeRF (Instant-NGP-style) — a third
model family with no reference counterpart (the reference implements
only the Fourier-encoded MLP, src/nerf.py:4-41 + src/encoding.py).

Motivation: the classic NeRF MLP spends its entire capacity re-deriving
spatial structure from Fourier features every step; a learned
multi-resolution feature grid moves that structure into trainable
tables that gradient descent updates directly, cutting the steps needed
to reach a given PSNR by an order of magnitude (Muller et al., 2022,
"Instant Neural Graphics Primitives" — technique reimplemented from the
paper's description; no NGP code was consulted).

TPU-first design departures from the CUDA original:

- STATIC SHAPES end to end: a fixed number of levels, each a
  fixed-size table. Levels whose corner count fits the table budget
  are DENSE (exact, collision-free); finer levels use the paper's
  xor-prime spatial hash modulo a fixed table size. No dynamic
  allocation, no pointer chasing — every lookup is one `jnp.take`
  gather that XLA lowers to a vectorized HBM gather.
- The per-point work is 8 gathers + a trilinear blend per level plus
  two tiny matmuls — bandwidth-bound, not MXU-bound, so this stays an
  XLA path (a Pallas kernel would only re-derive XLA's own fusion;
  the gathers dominate and Mosaic has no faster gather).
- Interpolation and compositing in fp32; the MLP runs in the
  configured compute dtype (bf16 on TPU) like every other family.
- The scene AABB is STATIC config (baked into the jitted program and
  persisted in checkpoint meta) — derived from the capture's rays by
  the driver (ops/occupancy.aabb_from_rays), not hard-coded.

The family plugs into the standard driver surface: `--model grid`
trains through make_train_block (so pool batching, sigma noise + decay,
EMA, weight decay, lr schedules, data-parallel sharding all compose),
renders through the generic chunked driver (render.py), checkpoints in
the standard schema, and is consumed by eval/make_gif via
utils/model_io.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict

# The paper's spatial-hash primes (pi_1 = 1 keeps x-major locality).
_HASH_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class GridNeRFConfig:
    """Static hyperparameters; hashable so jitted fns close over it."""

    n_levels: int = 8
    features: int = 2  # per-level feature width F
    base_res: int = 16  # coarsest grid resolution
    max_res: int = 128  # finest grid resolution
    table_size: int = 1 << 17  # hashed-level budget (entries per level)
    hidden: int = 64  # MLP width (both branches)
    geo_features: int = 15  # latent geometry features fed to color
    num_freqs_dir: int = 4  # Fourier bands for view directions
    # Scene bounds (lo_xyz, hi_xyz) — STATIC so the normalization bakes
    # into the compiled program; the driver derives it from the capture
    # and persists it in checkpoint meta.
    aabb: Tuple[float, float, float, float, float, float] = (
        -4.0, -4.0, -4.0, 4.0, 4.0, 4.0,
    )
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Gather strategy (numerically identical paths, parity-tested):
    #   "loop"    one jnp.take per level (n_levels serialized gathers)
    #   "cat"     all levels' tables concatenated per step into ONE
    #             (sum_T, F) buffer, every level+corner fetched by ONE
    #             gather — removes the per-level op serialization; the
    #             concat copy is ~1 MB/step, noise next to the gather.
    #   "cat_pib" same, with GatherScatterMode.PROMISE_IN_BOUNDS
    #             (indices are in range by construction: dense ids are
    #             clamped, hashed ids are masked) — drops the OOB
    #             select XLA emits on the gather and its transpose
    #             scatter. Default chosen from the measured on-chip
    #             attribution (benchmarks/r5/grid_profile.json).
    encode_impl: str = "loop"

    def level_resolutions(self) -> Tuple[int, ...]:
        """Geometric ladder base_res -> max_res over n_levels."""
        if self.n_levels == 1:
            return (self.base_res,)
        g = (self.max_res / self.base_res) ** (1.0 / (self.n_levels - 1))
        return tuple(
            int(round(self.base_res * g**l)) for l in range(self.n_levels)
        )

    def level_table_sizes(self) -> Tuple[int, ...]:
        """Entries per level: dense (R+1)^3 when it fits, else hashed."""
        return tuple(
            min((r + 1) ** 3, self.table_size)
            for r in self.level_resolutions()
        )

    def level_is_dense(self) -> Tuple[bool, ...]:
        return tuple(
            (r + 1) ** 3 <= self.table_size for r in self.level_resolutions()
        )


def init_grid_nerf(key: jax.Array, cfg: GridNeRFConfig = GridNeRFConfig()) -> Params:
    """Tables ~ U(-1e-4, 1e-4) (the paper's init: near-zero so the
    model starts as an empty field); MLP with the repo's per-layer
    uniform fan-in init (models/tinynerf._linear_init semantics)."""
    from tinynerf_tpu.models.tinynerf import _linear_init

    keys = jax.random.split(key, cfg.n_levels + 5)
    tables = {
        f"l{l}": jax.random.uniform(
            keys[l], (t, cfg.features), jnp.float32, -1e-4, 1e-4
        )
        for l, t in enumerate(cfg.level_table_sizes())
    }
    feat_dim = cfg.n_levels * cfg.features
    dir_dim = 3 + 6 * cfg.num_freqs_dir
    k = cfg.n_levels
    mlp = {
        # geometry branch: feat -> hidden -> (1 sigma + geo_features)
        "geo0": _linear_init(keys[k], feat_dim, cfg.hidden),
        "geo1": _linear_init(keys[k + 1], cfg.hidden, 1 + cfg.geo_features),
        # color branch: (geo_features + dir enc) -> hidden -> hidden -> 3
        "rgb0": _linear_init(keys[k + 2], cfg.geo_features + dir_dim, cfg.hidden),
        "rgb1": _linear_init(keys[k + 3], cfg.hidden, cfg.hidden),
        "rgb2": _linear_init(keys[k + 4], cfg.hidden, 3),
    }
    return {"tables": tables, "mlp": mlp}


def count_params(params: Params) -> int:
    return sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )


# Corner offsets of the unit cube, static (8, 3).
_CORNERS = np.stack(
    [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)]
).astype(np.int32)


def grid_encode(tables: Params, pts: jax.Array, cfg: GridNeRFConfig) -> jax.Array:
    """(N, 3) world points -> (N, n_levels * features) fp32 features.

    Points are normalized to [0, 1]^3 by the static AABB and clamped —
    out-of-box points read border cells (harmless: the box covers every
    reachable sample point by construction, see the driver's
    aabb_from_rays derivation).
    """
    lo = jnp.asarray(cfg.aabb[:3], jnp.float32)
    hi = jnp.asarray(cfg.aabb[3:], jnp.float32)
    u = jnp.clip((pts.astype(jnp.float32) - lo) / (hi - lo), 0.0, 1.0)
    lins, ws = [], []
    for l, (res, dense) in enumerate(
        zip(cfg.level_resolutions(), cfg.level_is_dense())
    ):
        lin, w = _level_ids(u, res, dense, cfg.table_size)
        lins.append(lin)
        ws.append(w)

    if cfg.encode_impl in ("cat", "cat_pib"):
        # One (sum_T, F) buffer + ONE gather for every level and corner
        # (vs n_levels serialized jnp.takes). The per-step concat copy
        # is tiny next to the gather; its gradient is a slice of the
        # one big scatter-add.
        sizes = cfg.level_table_sizes()
        offs = np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int32)
        big = jnp.concatenate(
            [tables[f"l{l}"] for l in range(cfg.n_levels)], axis=0
        )
        lin_all = jnp.stack(
            [lin + offs[l] for l, lin in enumerate(lins)], axis=1
        )  # (N, L, 8)
        if cfg.encode_impl == "cat_pib":
            feats = big.at[lin_all].get(mode="promise_in_bounds")
        else:
            feats = jnp.take(big, lin_all, axis=0)  # (N, L, 8, F)
        w_all = jnp.stack(ws, axis=1)  # (N, L, 8)
        return jnp.sum(w_all[..., None] * feats, axis=2).reshape(
            pts.shape[0], -1
        )

    outs = [
        jnp.sum(w[..., None] * jnp.take(tables[f"l{l}"], lin, axis=0), axis=1)
        for l, (lin, w) in enumerate(zip(lins, ws))
    ]
    return jnp.concatenate(outs, axis=-1)


def _level_ids(u, res: int, dense: bool, table_size: int):
    """Per-level corner ids + trilinear weights for normalized points
    u in [0,1]^3 -> (lin (N, 8) int32, w (N, 8) fp32)."""
    corners = jnp.asarray(_CORNERS)  # (8, 3)
    xs = u * res  # corner coords in [0, res]
    i0 = jnp.floor(xs).astype(jnp.int32)
    i0 = jnp.minimum(i0, res - 1)  # u==1.0 lands in the last cell
    f = xs - i0.astype(jnp.float32)  # (N, 3) in [0, 1]
    ids = i0[:, None, :] + corners[None, :, :]  # (N, 8, 3)
    if dense:
        side = res + 1
        lin = (ids[..., 0] * side + ids[..., 1]) * side + ids[..., 2]
    else:
        # xor-prime spatial hash mod table_size (power of two, so the
        # mod is a mask). uint32 wraparound is the hash's intended
        # arithmetic.
        h = ids.astype(jnp.uint32)
        lin = (
            h[..., 0] * np.uint32(_HASH_PRIMES[0])
            ^ h[..., 1] * np.uint32(_HASH_PRIMES[1])
            ^ h[..., 2] * np.uint32(_HASH_PRIMES[2])
        ) & np.uint32(table_size - 1)
        lin = lin.astype(jnp.int32)
    # Trilinear weights: prod over dims of (f if corner bit else 1-f).
    cb = corners[None].astype(jnp.float32)  # (1, 8, 3)
    w = jnp.prod(cb * f[:, None, :] + (1.0 - cb) * (1.0 - f[:, None, :]), axis=-1)
    return lin, w


def _dense_layer(h, wb, dt):
    return h.astype(dt) @ wb["w"].astype(dt) + wb["b"].astype(dt)


def apply_grid_nerf(
    params: Params,
    pts: jax.Array,
    dirs: jax.Array,
    cfg: GridNeRFConfig = GridNeRFConfig(),
    sigma_noise: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """((N, 3) points, (N, 3) UNIT view dirs) -> (rgb (N, 3), sigma (N,)).

    sigma = relu(raw + noise): same rectification-in-model convention
    as the other families (reference src/nerf.py:26), so the density
    noise lever (training.py) applies unchanged.
    """
    from tinynerf_tpu.ops.encoding import positional_encoding

    dt = cfg.compute_dtype
    feat = grid_encode(params["tables"], pts, cfg)
    mlp = params["mlp"]
    h = jnp.maximum(_dense_layer(feat, mlp["geo0"], dt), 0)
    geo = _dense_layer(h, mlp["geo1"], dt).astype(jnp.float32)
    sigma_raw = geo[:, 0]
    if sigma_noise is not None:
        sigma_raw = sigma_raw + jnp.reshape(sigma_noise, sigma_raw.shape)
    sigma = jax.nn.relu(sigma_raw)
    denc = positional_encoding(
        dirs.astype(jnp.float32), num_freqs=cfg.num_freqs_dir
    )
    c = jnp.concatenate([geo[:, 1:], denc], axis=-1)
    c = jnp.maximum(_dense_layer(c, mlp["rgb0"], dt), 0)
    c = jnp.maximum(_dense_layer(c, mlp["rgb1"], dt), 0)
    rgb = jax.nn.sigmoid(_dense_layer(c, mlp["rgb2"], dt).astype(jnp.float32))
    return rgb, sigma


def render_rays_grid(
    params: Params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    key: Optional[jax.Array],
    *,
    cfg: GridNeRFConfig,
    n_samples: int,
    near: float,
    far: float,
    white_bkgd: bool = True,
    sigma_noise: Optional[jax.Array] = None,
):
    """One uniform-quadrature pass: sample, encode, composite.

    Grid models converge without hierarchical resampling at these scene
    scales (the fine levels ARE the detail mechanism), so the family
    uses a single stratified pass; `--proposal occupancy` composes at
    the driver level if sample concentration is wanted later.
    Returns (comp_rgb, depth, acc, weights, z_vals).
    """
    from tinynerf_tpu.ops.sampling import stratified_samples
    from tinynerf_tpu.ops.volume import volume_render

    n_rays = rays_o.shape[0]
    z_vals, pts = stratified_samples(
        near, far, n_samples, rays_o, rays_d,
        randomized=key is not None, key=key,
    )
    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dirs = jnp.broadcast_to(dirs[:, None, :], (n_rays, n_samples, 3))
    rgb, sigma = apply_grid_nerf(
        params,
        pts.reshape(-1, 3),
        dirs.reshape(-1, 3),
        cfg,
        sigma_noise=sigma_noise,
    )
    comp, depth, acc, weights = volume_render(
        rgb.reshape(n_rays, n_samples, 3),
        sigma.reshape(n_rays, n_samples),
        z_vals,
        rays_d,
        white_bkgd=white_bkgd,
    )
    return comp, depth, acc, weights, z_vals


def make_grid_loss(cfg: GridNeRFConfig):
    """-> loss(params, ro, rd, target, key, s, noise_scale=1.0) for
    make_train_block — the same contract as training.loss_fn, so every
    train-block feature (scan blocks, EMA, decay schedules, sharding)
    applies unchanged."""

    def loss(params, ro, rd, target, key, s, noise_scale=1.0):
        noise = None
        if getattr(s, "sigma_noise_std", 0.0) > 0.0:
            key, k_noise = jax.random.split(key)
            noise = noise_scale * s.sigma_noise_std * jax.random.normal(
                k_noise, (ro.shape[0] * s.n_samples,), jnp.float32
            )
        comp, _, _, _, _ = render_rays_grid(
            params, ro, rd, key,
            cfg=cfg, n_samples=s.n_samples, near=s.near, far=s.far,
            white_bkgd=s.white_bkgd, sigma_noise=noise,
        )
        l = jnp.mean((comp - target.astype(jnp.float32)) ** 2)
        from tinynerf_tpu.utils.metrics import mse2psnr

        return l, {"loss": l, "psnr": mse2psnr(l)}

    return loss
