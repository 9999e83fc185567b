"""Sharded training: data-parallel ray batches + optional sample-axis
(sequence) parallelism over a TPU mesh.

Layout (SURVEY.md section 2's capability table):
- 'data' axis: each device draws its own n_rand/n_data rays (RNG key
  folded with the data axis index), computes local grads, and gradients
  are pmean'd over ICI — the global batch equals the reference's n_rand.
- 'sample' axis (optional): the per-ray sample axis is block-sharded;
  each device runs the MLP only on its sample block, summarizes it with
  the associative block composite (ops/volume.py), and the tiny per-ray
  block summaries are all_gather'd and combined — the sequence-parallel
  analog for volume rendering. Gradients are psum'd over 'sample'
  (each device holds only its block's contribution).

Parameters and optimizer state stay replicated (66k params — DP is the
only parallelism that pays here; psum per step is ~260KB over ICI).
The whole K-step lax.scan block runs inside one shard_map, so the
collectives pipeline with compute and there is no per-step dispatch.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from tinynerf_tpu.models.tinynerf import apply_tinynerf
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.ops.sampling import stratified_samples
from tinynerf_tpu.ops.volume import (
    combine_block_partials,
    composite_block_partials,
    global_deltas,
)
from tinynerf_tpu.parallel.mesh import DATA_AXIS, SAMPLE_AXIS, make_mesh, mesh_axes
from tinynerf_tpu.training import (
    TrainSettings,
    noise_scale_kwargs,
    settings_optimizer,
)
from tinynerf_tpu.utils.metrics import mse2psnr


def _block_sigma_noise(k_noise, noise_std, n_pts, n_sample, scale=1.0):
    """Per-sample-block density noise (see training.TrainSettings
    .sigma_noise_std): deterministic given (key, block index), so every
    sample peer's gathered composite is identical. `scale` (traced
    scalar ok) is the decay-schedule hook (sigma_noise_decay_steps)."""
    if n_sample > 1:
        k_noise = jax.random.fold_in(k_noise, jax.lax.axis_index(SAMPLE_AXIS))
    return scale * noise_std * jax.random.normal(k_noise, (n_pts, 1), jnp.float32)


def _sharded_loss(params, ro, rd, target, k_jitter, s: TrainSettings, n_sample: int, noise_scale=1.0):
    """Loss over this device's rays, MLP restricted to its sample block."""
    local_rand = ro.shape[0]
    sb = s.n_samples // n_sample
    noise_std = getattr(s, "sigma_noise_std", 0.0)
    k_noise = None
    if noise_std > 0.0:
        # Split ONLY when noise is on (noise-off streams unchanged).
        k_jitter, k_noise = jax.random.split(k_jitter)
    # z_vals for ALL samples, identical across the sample group (the
    # jitter key does not involve the sample axis index) — cheap (R, S).
    z_vals, _ = stratified_samples(
        s.near, s.far, s.n_samples, ro, rd, randomized=True, key=k_jitter
    )
    deltas = global_deltas(z_vals, rd)  # needs cross-block z's: computed globally

    if n_sample > 1:
        blk = jax.lax.axis_index(SAMPLE_AXIS) * sb
        z_blk = jax.lax.dynamic_slice_in_dim(z_vals, blk, sb, axis=1)
        d_blk = jax.lax.dynamic_slice_in_dim(deltas, blk, sb, axis=1)
    else:
        z_blk, d_blk = z_vals, deltas

    pts = ro[:, None, :] + rd[:, None, :] * z_blk[..., None]
    xenc = positional_encoding(pts.reshape(-1, 3), num_freqs=s.num_freqs)
    noise = (
        _block_sigma_noise(k_noise, noise_std, local_rand * sb, n_sample, noise_scale)
        if noise_std > 0.0
        else None
    )
    rgb, sigma = apply_tinynerf(params, xenc, s.model_cfg, sigma_noise=noise)
    partials = composite_block_partials(
        rgb.reshape(local_rand, sb, 3), sigma.reshape(local_rand, sb), z_blk, d_blk
    )
    if n_sample > 1:
        # (B, R, ...) block summaries from every sample-axis peer.
        partials = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, SAMPLE_AXIS, axis=0), partials
        )
    else:
        partials = jax.tree_util.tree_map(lambda x: x[None], partials)
    comp_rgb, _, _ = combine_block_partials(partials, white_bkgd=s.white_bkgd)
    loss = jnp.mean((comp_rgb - target.astype(jnp.float32)) ** 2)
    return loss, {"loss": loss, "psnr": mse2psnr(loss)}


def _sharded_nerf_loss(
    params, ro, rd, target, key, s: TrainSettings, n_sample: int, cfg, n_fine: int,
    noise_scale=1.0, fused_kernels: bool = False,
):
    """Hierarchical (coarse+fine) loss with the fine pass's sample-axis
    union sharded over SAMPLE_AXIS — the "long-context" case the 2-D
    mesh exists for (SURVEY.md section 5): the fine union (n_samples +
    n_fine, 192 at the canonical recipe) is the sequence axis; each
    device runs the MLP only on its sample block and blocks combine via
    the associative composite (ops/volume.py).

    Semantics match models/nerf.make_hierarchical_loss: mse(coarse) +
    mse(fine), stop_gradient on the resampling weights, PSNR from the
    fine composite. Every sample peer computes the identical loss (the
    jitter/resample keys do not involve the sample index), so the
    caller's pmean over SAMPLE_AXIS recovers sum-of-block gradient
    contributions exactly (see make_sharded_train_block).

    fused_kernels=True swaps each pass's encode->MLP->block-composite
    for the Pallas block-partials kernel pair
    (kernels/fused_partials.py): the kernel emits the SAME {T, C, D, A}
    summaries (+ local weights for the coarse pass's resampling), so
    the gather/combine and gradient collectives are unchanged — the
    cotangents jax.grad sends back through all_gather+combine are
    consumed by the kernel's fused backward. This composes the two
    sample-axis scaling mechanisms: in-kernel streaming (VMEM) x
    cross-device sharding (ICI).
    """
    from tinynerf_tpu.models.nerf import apply_nerf_mlp
    from tinynerf_tpu.ops.sampling import sample_pdf

    if fused_kernels:
        from tinynerf_tpu.kernels.fused_partials import (
            make_fused_block_partials_fn,
        )

    local_rand = ro.shape[0]
    noise_std = getattr(s, "sigma_noise_std", 0.0)
    k_nc = k_nf = None
    if noise_std > 0.0:
        # Split ONLY when noise is on (noise-off streams unchanged).
        key, k_nc, k_nf = jax.random.split(key, 3)
    k_strat, k_pdf = jax.random.split(key)

    if cfg.use_viewdirs:
        vdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        d_enc_ray = positional_encoding(vdirs, num_freqs=cfg.num_freqs_dir)
    else:
        d_enc_ray = None

    def sharded_pass(mlp_params, z_vals, need_weights: bool, k_noise=None):
        """z_vals (R, S) identical across sample peers -> composite
        (and optionally the full (R, S) per-sample weights)."""
        S = z_vals.shape[1]
        sb = S // n_sample
        deltas = global_deltas(z_vals, rd)
        if n_sample > 1:
            blk = jax.lax.axis_index(SAMPLE_AXIS) * sb
            z_blk = jax.lax.dynamic_slice_in_dim(z_vals, blk, sb, axis=1)
            d_blk = jax.lax.dynamic_slice_in_dim(deltas, blk, sb, axis=1)
        else:
            z_blk, d_blk = z_vals, deltas

        noise = (
            _block_sigma_noise(k_noise, noise_std, local_rand * sb, n_sample, noise_scale)
            if noise_std > 0.0
            else None
        )
        if fused_kernels:
            # Pallas block-partials kernel: same {T,C,D,A} (+ local w)
            # summaries, fused encode->MLP->composite in VMEM.
            # sample_block: largest divisor of the shard <= 128 (the
            # kernel streams any block size; sublane slices want
            # divisibility, e.g. shard 160 -> block 80). tile_r stays a
            # power-of-two lane tile: unaligned lane offsets are a
            # Mosaic constraint, so local_rand must be a multiple of
            # min(128, local_rand) — the kernel raises loudly if not.
            from tinynerf_tpu.kernels.fused_nerf_stream import pick_sample_block

            partials, w_local = make_fused_block_partials_fn(
                cfg,
                emit_weights=need_weights,
                tile_r=min(128, local_rand),
                sample_block=pick_sample_block(sb),
            )(
                mlp_params,
                ro,
                rd,
                z_blk,
                d_blk,
                noise.reshape(local_rand, sb)
                if noise is not None
                else jnp.zeros((local_rand, sb), jnp.float32),
            )
        else:
            pts = ro[:, None, :] + rd[:, None, :] * z_blk[..., None]
            x_enc = positional_encoding(
                pts.reshape(-1, 3), num_freqs=cfg.num_freqs
            )
            d_enc = (
                jnp.repeat(d_enc_ray, sb, axis=0) if cfg.use_viewdirs else None
            )
            rgb, sigma = apply_nerf_mlp(
                mlp_params, x_enc, d_enc, cfg, sigma_noise=noise
            )
            partials, w_local = composite_block_partials(
                rgb.reshape(local_rand, sb, 3),
                sigma.reshape(local_rand, sb),
                z_blk,
                d_blk,
                return_weights=True,
            )
        if n_sample > 1:
            gathered = jax.tree_util.tree_map(
                lambda x: jax.lax.all_gather(x, SAMPLE_AXIS, axis=0), partials
            )
            comp, _, _ = combine_block_partials(gathered, white_bkgd=s.white_bkgd)
            if not need_weights:
                return comp, None
            # Global per-sample weights: local weights scaled by this
            # block's entry transmittance, gathered over blocks.
            T = gathered["T"]  # (B, R)
            cum = jnp.cumprod(T, axis=0)
            lead = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
            my_lead = lead[jax.lax.axis_index(SAMPLE_AXIS)]  # (R,)
            w_blocks = jax.lax.all_gather(
                w_local * my_lead[:, None], SAMPLE_AXIS, axis=0
            )  # (B, R, sb)
            weights = jnp.moveaxis(w_blocks, 0, 1).reshape(local_rand, S)
            return comp, weights
        stacked = jax.tree_util.tree_map(lambda x: x[None], partials)
        comp, _, _ = combine_block_partials(stacked, white_bkgd=s.white_bkgd)
        return comp, (w_local if need_weights else None)

    # --- coarse ---
    z_c, _ = stratified_samples(
        s.near, s.far, s.n_samples, ro, rd, randomized=True, key=k_strat
    )
    comp_c, weights = sharded_pass(
        params["coarse"], z_c, need_weights=True, k_noise=k_nc
    )

    # --- hierarchical resample (identical on all sample peers) ---
    z_mids = 0.5 * (z_c[:, 1:] + z_c[:, :-1])
    z_f = sample_pdf(
        z_mids,
        jax.lax.stop_gradient(weights[:, 1:-1]),
        n_fine,
        randomized=True,
        key=k_pdf,
    )
    z_union = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)

    # --- fine (the long sample axis this mesh exists to shard) ---
    comp_f, _ = sharded_pass(
        params["fine"], z_union, need_weights=False, k_noise=k_nf
    )

    t = target.astype(jnp.float32)
    mse_c = jnp.mean((comp_c - t) ** 2)
    mse_f = jnp.mean((comp_f - t) ** 2)
    return mse_c + mse_f, {
        "loss": mse_f,
        "psnr": mse2psnr(mse_f),
        "loss_coarse": mse_c,
    }


def make_sharded_train_block(
    s: TrainSettings,
    block_size: int,
    mesh: Optional[Mesh] = None,
    loss=None,
    grad_fn=None,
    nerf_cfg=None,
    n_fine: int = 64,
    fused_kernels: bool = False,
    extra_grad_fn=None,
):
    """Jitted sharded K-step block with the same signature as
    training.make_train_block: (params, opt_state, key, step0,
    rays_o_all, rays_d_all, pixels) -> (params, opt_state, metrics).
    extra_grad_fn (params, key) -> grads is added post-pmean (see
    step_body) — e.g. the free-space sparsity prior.

    All arguments are replicated; parallelism comes from per-device ray
    draws + sample-block assignment and is closed by collectives, so
    results (params, metrics) come back replicated and bitwise
    identical on every device.
    """
    mesh = mesh or make_mesh()
    n_data, n_sample = mesh_axes(mesh)
    if s.n_rand % n_data:
        raise ValueError(f"n_rand={s.n_rand} not divisible by data axis {n_data}")
    if s.n_samples % n_sample:
        raise ValueError(f"n_samples={s.n_samples} not divisible by sample axis {n_sample}")
    if nerf_cfg is not None:
        if loss is not None or grad_fn is not None:
            raise ValueError("nerf_cfg replaces loss/grad_fn")
        if (s.n_samples + n_fine) % n_sample:
            raise ValueError(
                f"fine union {s.n_samples}+{n_fine} not divisible by "
                f"sample axis {n_sample}"
            )
        loss = lambda p, ro, rd, t, k, s_, noise_scale=1.0: _sharded_nerf_loss(
            p, ro, rd, t, k, s_, n_sample, nerf_cfg, n_fine,
            noise_scale=noise_scale, fused_kernels=fused_kernels,
        )
    elif fused_kernels:
        raise ValueError(
            "fused_kernels requires nerf_cfg (the block-partials kernels "
            "implement the NeRF MLP; the TinyNeRF sharded loss is XLA-only)"
        )
    elif loss is not None and n_sample > 1:
        raise ValueError(
            "generic custom losses are data-parallel only (they are not "
            "sample-axis aware); pass nerf_cfg for the sharded "
            "hierarchical loss, or use sample_parallel=1"
        )
    if grad_fn is not None and n_sample > 1:
        raise ValueError("grad_fn (fused train kernel) is data-parallel only")
    local_rand = s.n_rand // n_data
    opt = settings_optimizer(s)
    axes = mesh.axis_names

    def step_body(params, opt_state, key, step, rays_o_all, rays_d_all, pixels):
        n_images, hw = rays_o_all.shape[0], rays_o_all.shape[1]
        data_idx = jax.lax.axis_index(DATA_AXIS)
        k_step = jax.random.fold_in(jax.random.fold_in(key, step), data_idx)
        k_inds, k_jitter = jax.random.split(k_step)
        if s.ray_sampling == "pool":
            inds = jax.random.randint(k_inds, (local_rand,), 0, n_images * hw)
            ro = rays_o_all.reshape(n_images * hw, 3)[inds]
            rd = rays_d_all.reshape(n_images * hw, 3)[inds]
            target = pixels.reshape(n_images * hw, 3)[inds]
        else:
            img_i = jnp.mod(step, n_images)
            inds = jax.random.randint(k_inds, (local_rand,), 0, hw)
            ro = rays_o_all[img_i][inds]
            rd = rays_d_all[img_i][inds]
            target = pixels[img_i][inds]

        nkw = noise_scale_kwargs(s, step)
        if grad_fn is not None:
            # e.g. the fused Pallas train kernel: each device runs it on
            # its local ray shard; grads are then pmean'd like any DP.
            grads, metrics = grad_fn(params, ro, rd, target, k_jitter, **nkw)
        else:
            if loss is not None:
                local_loss = lambda p: loss(p, ro, rd, target, k_jitter, s, **nkw)
            else:
                local_loss = lambda p: _sharded_loss(
                    p, ro, rd, target, k_jitter, s, n_sample, **nkw
                )
            grads, metrics = jax.grad(local_loss, has_aux=True)(params)
        if n_sample > 1:
            # Each device's local grad is n_sample * (its block's true
            # contribution): the loss is computed redundantly on every
            # sample peer and all_gather's transpose (a psum-scatter)
            # sums the identical cotangents. pmean = psum / n_sample
            # recovers exactly sum-of-block-contributions.
            grads = jax.lax.pmean(grads, SAMPLE_AXIS)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, axes)
        if extra_grad_fn is not None:
            # Regularizer gradient AFTER the pmean, from the SHARED key
            # (not the device-folded one): identical on every device,
            # preserving the block's replicated-params contract.
            from tinynerf_tpu.ops.regularizers import add_grads

            grads = add_grads(
                grads, extra_grad_fn(params, jax.random.fold_in(key, step))
            )

        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    def block(params, opt_state, key, step0, rays_o_all, rays_d_all, pixels):
        def body(carry, i):
            params, opt_state = carry
            params, opt_state, metrics = step_body(
                params, opt_state, key, step0 + i, rays_o_all, rays_d_all, pixels
            )
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(block_size)
        )
        return params, opt_state, metrics

    sharded = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))
