"""Occupancy-grid proposal sampling (NerfAcc-style), TPU-first.

Replaces the coarse MLP as the hierarchical proposal: per-ray samples
are drawn by inverse-CDF over segment weights read from a density grid
of the scene volume, so the expensive MLP only runs on ONE pass (the
reference's proposal is a full second MLP, src/train.py:114-121; the
technique is PAPERS.md's "NerfAcc: Efficient Sampling Accelerates
NeRFs" rebuilt for XLA).

Two deliberate departures from the CUDA original, both for the TPU
compilation model:

- **Stateless grid.** NerfAcc carries an EMA-updated occupancy field
  because its sparse updates are cheap on CUDA. Here the grid is a
  PURE FUNCTION of the current MLP params, recomputed once per jitted
  train block / render call: G^3 = 64^3 cell-center sigma evals are
  ~1.3 training steps of MLP work, amortized over a 50-step block
  (~3%). No state to checkpoint, no staleness, no invalidation — a
  checkpoint alone fully determines the sampler.
- **Static shapes.** No ray packing / sample compaction: every ray
  draws the same n_samples by inverse-CDF (ops/sampling.sample_pdf)
  over a fixed segment count, with a probability floor so unexplored
  space keeps minimum coverage (the exploration term; without it a
  cell the sampler never visits could never be learned occupied).

Training integration: `make_occupancy_train_block` (same signature as
training.make_train_block); rendering: render.make_occupancy_image_
renderer. Both share the grid + sampling code below.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tinynerf_tpu.models.nerf import NeRFConfig, apply_nerf_mlp
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.ops.sampling import sample_pdf
from tinynerf_tpu.ops.volume import volume_render
from tinynerf_tpu.utils.metrics import mse2psnr

DEFAULT_RESOLUTION = 64
DEFAULT_N_SEGMENTS = 64
DEFAULT_FLOOR = 1e-2
# Scene AABB half-extent. The inward-facing capture (cameras at radius
# ~4, near 2 / far 6) has its content inside ~|x| < 2; 3.0 leaves
# margin. Points outside the box read density 0 and are covered by the
# sampling floor only.
DEFAULT_HALF_EXTENT = 3.0


def default_aabb(half_extent: float = DEFAULT_HALF_EXTENT) -> jnp.ndarray:
    return jnp.array(
        [[-half_extent] * 3, [half_extent] * 3], dtype=jnp.float32
    )


# Re-exported for callers that import it alongside the sampler.
from tinynerf_tpu.kernels.fused_nerf_stream import pick_sample_block  # noqa: E402,F401


def aabb_from_rays(rays_o, rays_d, near: float, far: float,
                   margin: float = 0.05) -> jnp.ndarray:
    """(2, 3) AABB covering every sample point any ray can produce —
    the union of the [near, far] segment endpoints over all rays, with
    a small relative margin. Derived from the actual capture, so the
    grid adapts to scene scale instead of assuming the reference's
    radius-4 rig (DEFAULT_HALF_EXTENT). Deterministic given the data:
    training and render consumers recompute the identical box, and the
    driver persists it in checkpoint meta as the source of truth."""
    o = jnp.reshape(rays_o, (-1, 3)).astype(jnp.float32)
    d = jnp.reshape(rays_d, (-1, 3)).astype(jnp.float32)
    pts = jnp.concatenate([o + d * near, o + d * far], axis=0)
    lo, hi = jnp.min(pts, axis=0), jnp.max(pts, axis=0)
    pad = margin * (hi - lo)
    return jnp.stack([lo - pad, hi + pad], axis=0)


def density_grid(
    mlp_params,
    cfg: NeRFConfig,
    *,
    resolution: int = DEFAULT_RESOLUTION,
    aabb: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """(G, G, G) sigma field sampled at cell centers (or a jittered
    point per cell when `key` is given — stochastic anti-aliasing of
    sub-cell structure across blocks, NerfAcc's in-cell sampling)."""
    aabb = default_aabb() if aabb is None else aabb
    g = resolution
    lo, hi = aabb[0], aabb[1]
    centers = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g  # (G,) in (0,1)
    u = jnp.stack(
        jnp.meshgrid(centers, centers, centers, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    if key is not None:
        u = u + jax.random.uniform(key, u.shape, minval=-0.5, maxval=0.5) / g
    pts = lo + u * (hi - lo)
    x_enc = positional_encoding(pts, num_freqs=cfg.num_freqs)
    d_enc = None
    if cfg.use_viewdirs:
        # sigma is view-independent by construction (the density head
        # branches off BEFORE the viewdir concat, models/nerf.py); any
        # direction works — encode +z.
        d_enc = jnp.broadcast_to(
            positional_encoding(
                jnp.array([[0.0, 0.0, 1.0]]), num_freqs=cfg.num_freqs_dir
            ),
            (pts.shape[0], 3 + 6 * cfg.num_freqs_dir),
        )
    _, sigma = apply_nerf_mlp(mlp_params, x_enc, d_enc, cfg)
    return sigma.reshape(g, g, g)


def ray_segment_alphas(
    grid: jax.Array,
    rays_o: jax.Array,
    rays_d: jax.Array,
    near: float,
    far: float,
    *,
    n_segments: int = DEFAULT_N_SEGMENTS,
    aabb: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """-> (alphas (R, n_segments), edges (n_segments+1,)).

    Each ray's [near, far] range is cut into n_segments uniform
    segments; the segment's occupancy alpha = 1 - exp(-sigma_cell *
    seg_len) with sigma read (nearest cell) at the segment midpoint.
    Outside the AABB sigma reads 0."""
    aabb = default_aabb() if aabb is None else aabb
    g = grid.shape[0]
    lo, hi = aabb[0], aabb[1]
    edges = jnp.linspace(near, far, n_segments + 1, dtype=jnp.float32)
    mids = 0.5 * (edges[1:] + edges[:-1])  # (S,)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mids[None, :, None]
    u = (pts - lo) / (hi - lo)
    inside = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)  # (R, S)
    idx = jnp.clip((u * g).astype(jnp.int32), 0, g - 1)
    sigma = grid[idx[..., 0], idx[..., 1], idx[..., 2]]
    sigma = jnp.where(inside, sigma, 0.0)
    seg_len = (far - near) / n_segments * jnp.linalg.norm(
        rays_d, axis=-1, keepdims=True
    )
    return 1.0 - jnp.exp(-sigma * seg_len), edges


def occupancy_samples(
    grid: jax.Array,
    rays_o: jax.Array,
    rays_d: jax.Array,
    near: float,
    far: float,
    n_samples: int,
    *,
    n_segments: int = DEFAULT_N_SEGMENTS,
    floor: float = DEFAULT_FLOOR,
    aabb: Optional[jax.Array] = None,
    randomized: bool = False,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """(R, n_samples) sorted depths, importance-sampled from the grid.

    floor: additive per-segment weight floor (relative to alpha's [0,1]
    scale) — the exploration term; floor=inf degenerates to stratified-
    uniform, floor=0 would never revisit space the grid believes empty.
    """
    alphas, edges = ray_segment_alphas(
        grid, rays_o, rays_d, near, far, n_segments=n_segments, aabb=aabb
    )
    w = alphas + floor
    bins = jnp.broadcast_to(edges, (rays_o.shape[0], n_segments + 1))
    return sample_pdf(bins, w, n_samples, randomized=randomized, key=key)


def make_occupancy_loss(cfg: NeRFConfig, *, n_segments=DEFAULT_N_SEGMENTS,
                        floor=DEFAULT_FLOOR, aabb=None):
    """(params{'fine'}, grid, ro, rd, target, key, s, noise_scale)
    -> (mse, metrics). Single-MLP XLA loss on grid-proposed samples.
    The grid is an explicit argument (stop-gradient by construction:
    integer gathers carry no tangent) computed once per block."""

    def loss(params, grid, ro, rd, target, key, s, noise_scale=1.0):
        R = ro.shape[0]
        noise_std = getattr(s, "sigma_noise_std", 0.0)
        k_noise = None
        if noise_std > 0.0:
            key, k_noise = jax.random.split(key)
        z = occupancy_samples(
            grid, ro, rd, s.near, s.far, s.n_samples,
            n_segments=n_segments, floor=floor, aabb=aabb,
            randomized=True, key=key,
        )
        S = z.shape[1]
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        x_enc = positional_encoding(pts.reshape(-1, 3), num_freqs=cfg.num_freqs)
        d_enc = None
        if cfg.use_viewdirs:
            vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            d_enc = jnp.repeat(
                positional_encoding(vd, num_freqs=cfg.num_freqs_dir), S, axis=0
            )
        noise = (
            noise_scale * noise_std
            * jax.random.normal(k_noise, (R * S, 1), jnp.float32)
            if noise_std > 0.0
            else None
        )
        rgb, sigma = apply_nerf_mlp(
            params["fine"], x_enc, d_enc, cfg, sigma_noise=noise
        )
        comp, _, _, _ = volume_render(
            rgb.reshape(R, S, 3), sigma.reshape(R, S), z, rd,
            white_bkgd=s.white_bkgd,
        )
        mse = jnp.mean((comp - target.astype(jnp.float32)) ** 2)
        return mse, {"loss": mse, "psnr": mse2psnr(mse)}

    return loss


def make_occupancy_fused_grad_fn(cfg: NeRFConfig, *, n_segments=DEFAULT_N_SEGMENTS,
                                 floor=DEFAULT_FLOOR, aabb=None,
                                 sample_block: Optional[int] = None,
                                 interpret=None):
    """Fused twin of make_occupancy_loss: z proposed in XLA from the
    grid, the MLP fwd+bwd in the streamed Pallas kernel
    (kernels/fused_nerf_stream.py — it takes caller z, exactly this
    composition point). -> (params, grid, ro, rd, target, key, s,
    noise_scale) -> (grads, metrics)."""
    from tinynerf_tpu.kernels.fused_nerf_stream import (
        fused_nerf_pass_grads_streamed,
    )

    def grad_fn(params, grid, ro, rd, target, key, s, noise_scale=1.0):
        R = ro.shape[0]
        noise_std = getattr(s, "sigma_noise_std", 0.0)
        k_noise = None
        if noise_std > 0.0:
            key, k_noise = jax.random.split(key)
        z = occupancy_samples(
            grid, ro, rd, s.near, s.far, s.n_samples,
            n_segments=n_segments, floor=floor, aabb=aabb,
            randomized=True, key=key,
        )
        noise = (
            noise_scale * noise_std
            * jax.random.normal(k_noise, (R, z.shape[1]), jnp.float32)
            if noise_std > 0.0
            else None
        )
        loss, g_mlp = fused_nerf_pass_grads_streamed(
            params["fine"], ro, rd, target, z, sigma_noise=noise,
            white_bkgd=s.white_bkgd, cfg=cfg,
            sample_block=sample_block or pick_sample_block(z.shape[1]),
            interpret=interpret,
        )
        return {"fine": g_mlp}, {"loss": loss, "psnr": mse2psnr(loss)}

    return grad_fn


def make_occupancy_train_block(
    s,
    block_size: int,
    cfg: NeRFConfig,
    *,
    resolution: int = DEFAULT_RESOLUTION,
    n_segments: int = DEFAULT_N_SEGMENTS,
    floor: float = DEFAULT_FLOOR,
    aabb: Optional[jax.Array] = None,
    fused: bool = False,
    interpret=None,
    mesh=None,
    extra_grad_fn=None,
):
    """Jitted K-step block, signature-compatible with
    training.make_train_block's return. Per block: ONE density-grid
    rebuild from the carried params (jittered cell points keyed on
    step0), then `block_size` scan steps sampling from that grid.
    Params pytree: {'fine': mlp} — single MLP, the grid IS the coarse
    stage.

    mesh: optional 1-D ('data',) Mesh for ray-batch data parallelism —
    each device draws its own n_rand/n_data rays (key additionally
    folded with the data index), rebuilds the identical grid from the
    replicated params, and grads are pmean'd over ICI (same layout as
    parallel/train.py). Sample-axis meshes are not supported here (the
    grid proposal has no per-pass composite to shard)."""
    from tinynerf_tpu.training import (
        draw_ray_batch,
        noise_scale_kwargs,
        settings_optimizer,
    )

    n_data = 1
    if mesh is not None:
        from tinynerf_tpu.parallel.mesh import DATA_AXIS, mesh_axes

        n_data, n_sample = mesh_axes(mesh)
        if n_sample > 1:
            raise ValueError(
                "occupancy proposal supports data-parallel meshes only "
                f"(got sample axis {n_sample})"
            )
        if s.n_rand % n_data:
            raise ValueError(
                f"n_rand={s.n_rand} not divisible by data axis {n_data}"
            )
        import dataclasses

        s_local = dataclasses.replace(s, n_rand=s.n_rand // n_data)
    else:
        s_local = s

    opt = settings_optimizer(s)
    if fused:
        fn = make_occupancy_fused_grad_fn(
            cfg, n_segments=n_segments, floor=floor, aabb=aabb,
            interpret=interpret,
        )
    else:
        loss = make_occupancy_loss(
            cfg, n_segments=n_segments, floor=floor, aabb=aabb
        )

    def block(params, opt_state, key, step0, rays_o_all, rays_d_all, pixels):
        # Identical on every data peer: the grid key ignores the data
        # index (replicated params -> replicated grid, no collective).
        # Grid-jitter key: the tag folds FIRST and sits far outside any
        # plausible step/device-index range, so the stream can never
        # collide with draw_ray_batch's fold_in(fold_in(key, idx), step)
        # chains (a small trailing tag would equal some step value).
        grid = density_grid(
            params["fine"], cfg, resolution=resolution, aabb=aabb,
            key=jax.random.fold_in(jax.random.fold_in(key, 0x0CC00000), step0),
        )
        grid = jax.lax.stop_gradient(grid)
        if mesh is not None:
            from tinynerf_tpu.parallel.mesh import DATA_AXIS

            k_dev = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        else:
            k_dev = key

        def body(carry, i):
            params, opt_state = carry
            step = step0 + i
            ro, rd, target, k_jitter = draw_ray_batch(
                s_local, k_dev, step, rays_o_all, rays_d_all, pixels
            )
            nkw = noise_scale_kwargs(s, step)
            if fused:
                grads, metrics = fn(
                    params, grid, ro, rd, target, k_jitter, s, **nkw
                )
            else:
                grads, metrics = jax.grad(
                    lambda p: loss(p, grid, ro, rd, target, k_jitter, s, **nkw),
                    has_aux=True,
                )(params)
            if extra_grad_fn is not None:
                # Regularizer gradient (e.g. the free-space sparsity
                # prior). Under a data mesh each peer draws its own
                # points (k_jitter is device-folded) and the pmean just
                # averages the estimates — same expectation, less noise.
                from tinynerf_tpu.ops.regularizers import add_grads

                grads = add_grads(grads, extra_grad_fn(params, k_jitter))
            if mesh is not None:
                from tinynerf_tpu.parallel.mesh import DATA_AXIS

                grads = jax.lax.pmean(grads, DATA_AXIS)
                metrics = jax.lax.pmean(metrics, DATA_AXIS)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(block_size)
        )
        return params, opt_state, metrics

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        block = jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    return jax.jit(block, donate_argnums=(0, 1))
