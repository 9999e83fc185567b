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
from tinynerf_tpu.training import TrainSettings, settings_optimizer
from tinynerf_tpu.utils.metrics import mse2psnr


def _sharded_loss(params, ro, rd, target, k_jitter, s: TrainSettings, n_sample: int):
    """Loss over this device's rays, MLP restricted to its sample block."""
    local_rand = ro.shape[0]
    sb = s.n_samples // n_sample
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
    rgb, sigma = apply_tinynerf(params, xenc, s.model_cfg)
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


def make_sharded_train_block(
    s: TrainSettings,
    block_size: int,
    mesh: Optional[Mesh] = None,
    loss=None,
    grad_fn=None,
):
    """Jitted sharded K-step block with the same signature as
    training.make_train_block: (params, opt_state, key, step0,
    rays_o_all, rays_d_all, pixels) -> (params, opt_state, metrics).

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
    if loss is not None and n_sample > 1:
        raise ValueError(
            "custom losses (e.g. hierarchical NeRF) are data-parallel only; "
            "use sample_parallel=1"
        )
    if grad_fn is not None and n_sample > 1:
        raise ValueError("grad_fn (fused train kernel) is data-parallel only")
    local_rand = s.n_rand // n_data
    opt = settings_optimizer(s)
    axes = mesh.axis_names

    def step_body(params, opt_state, key, step, rays_o_all, rays_d_all, pixels):
        n_images, hw = rays_o_all.shape[0], rays_o_all.shape[1]
        img_i = jnp.mod(step, n_images)
        data_idx = jax.lax.axis_index(DATA_AXIS)
        k_step = jax.random.fold_in(jax.random.fold_in(key, step), data_idx)
        k_inds, k_jitter = jax.random.split(k_step)
        inds = jax.random.randint(k_inds, (local_rand,), 0, hw)
        ro = rays_o_all[img_i][inds]
        rd = rays_d_all[img_i][inds]
        target = pixels[img_i][inds]

        if grad_fn is not None:
            # e.g. the fused Pallas train kernel: each device runs it on
            # its local ray shard; grads are then pmean'd like any DP.
            grads, metrics = grad_fn(params, ro, rd, target, k_jitter)
        else:
            if loss is not None:
                local_loss = lambda p: loss(p, ro, rd, target, k_jitter, s)
            else:
                local_loss = lambda p: _sharded_loss(
                    p, ro, rd, target, k_jitter, s, n_sample
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
