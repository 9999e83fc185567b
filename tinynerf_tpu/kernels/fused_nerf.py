"""Fused Pallas kernel for the full NeRF MLP (view-direction
conditioning) and the fully-fused hierarchical render pipeline.

One kernel invocation runs, per ray-tile and entirely in VMEM:
points (from analytic stratified depths OR caller-provided depths) ->
Fourier encoding -> trunk MLP with skip -> sigma head -> view-direction
branch (dir encodings computed in-register per ray, tiled per point) ->
rgb head -> alpha composite. Optionally emits per-sample composite
weights in (S, TILE_R) layout — the input to hierarchical inverse-CDF
resampling.

The hierarchical path (BASELINE config 4) then fuses end to end:
  coarse kernel (analytic z, weights out)
    -> sample_pdf (ops/sampling.py, tiny XLA op on (R, S) weights)
    -> sorted union of depths
    -> fine kernel (z input as an (S', R) array, (S', TILE_R) blocks)
and the (n_rays*samples)-sized encodings/activations of BOTH passes
never touch HBM.

Depth input layout: z is passed transposed as (S, R); a (S, TILE_R)
block row-major-flattens to exactly the kernel's sample-major point
order (p = s*TILE_R + r) via a lane-merge reshape (supported by
Mosaic; the sublane-merge direction is not — see fused_render.py).

Architecture parity: models/nerf.py::apply_nerf_mlp (sigma
view-independent from the trunk, rgb = sigmoid(W2 relu(W1 [h, d_enc])));
encoding orders match the reference's interleaved sin/cos via row
permutations of the first-layer / skip / direction-branch weights.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynerf_tpu.kernels.fused_render import _encode_permutation, _iota2
from tinynerf_tpu.models.nerf import NeRFConfig
from tinynerf_tpu.ops.volume import DELTA_INF, TRANS_EPS

DEFAULT_TILE_R = 128


def _dir_permutation(num_freqs_dir: int) -> np.ndarray:
    return _encode_permutation(num_freqs_dir)


def _nerf_kernel(
    o_ref,  # (3, TR)
    d_ref,  # (3, TR)
    *args,  # [z_ref (S, TR)]? + weight/bias refs + out refs
    S: int,
    has_z: bool,
    emit_weights: bool,
    num_freqs: int,
    num_freqs_dir: int,
    use_viewdirs: bool,
    n_layers: int,
    skip_at: int,
    near: float,
    far: float,
    compute_dtype,
):
    if has_z:
        z_ref, args = args[0], args[1:]
    n_out = 2 if emit_weights else 1
    wb = args[:-n_out]
    out_ref = args[-n_out]
    w_ref = args[-1] if emit_weights else None

    TR = o_ref.shape[1]
    P = TR * S
    L = num_freqs
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST

    s_row = _iota2((1, P), 1) // TR
    if has_z:
        # (S, TR) row-major == sample-major flat order: lane-merge.
        z_row = z_ref[:].reshape(1, P)
    else:
        t = s_row.astype(f32) / (S - 1)
        z_row = near * (1.0 - t) + far * t

    norm = jnp.sqrt(jnp.sum(d_ref[:] * d_ref[:], axis=0, keepdims=True))  # (1, TR)
    norm_rep = pltpu.repeat(norm, S, axis=1)
    z_next = pltpu.roll(z_row, shift=P - TR, axis=1)
    delta = jnp.where(s_row == S - 1, DELTA_INF, z_next - z_row) * norm_rep

    od = pltpu.repeat(jnp.concatenate([o_ref[:], d_ref[:]], axis=0), S, axis=1)
    pts = od[0:3] + od[3:6] * z_row  # (3, P)

    def fourier(x, n_freqs, width):
        r_ids = _iota2((3 * n_freqs, 3), 0)
        c_ids = _iota2((3 * n_freqs, 3), 1)
        B = jnp.where(r_ids % 3 == c_ids, jnp.exp2((r_ids // 3).astype(f32)), 0.0)
        th = jnp.dot(B, x, preferred_element_type=f32, precision=HI)
        return jnp.concatenate([x, jnp.sin(th), jnp.cos(th)], axis=0)

    enc = fourier(pts, L, P)  # (E, P)
    enc_c = enc.astype(compute_dtype)

    def dense(h_c, i):
        return (
            jnp.dot(
                wb[2 * i][:].astype(compute_dtype), h_c,
                preferred_element_type=f32,
            )
            + wb[2 * i + 1][:]
        )

    h_c = enc_c
    for i in range(n_layers):
        h_in = h_c if i != skip_at else jnp.concatenate([h_c, enc_c], axis=0)
        h_c = jnp.maximum(dense(h_in, i), 0.0).astype(compute_dtype)
        # note: like models/nerf.py, skip concat happens AFTER relu of
        # layer (skip_at - 1) == input of layer skip_at
    sigma = jnp.maximum(dense(h_c, n_layers), 0.0)  # (1, P)

    if use_viewdirs:
        vdir = d_ref[:] / jnp.sqrt(
            jnp.sum(d_ref[:] * d_ref[:], axis=0, keepdims=True)
        )  # (3, TR)
        enc_d = fourier(vdir, num_freqs_dir, TR)  # (Dd, TR)
        enc_d_rep = pltpu.repeat(enc_d, S, axis=1).astype(compute_dtype)  # (Dd, P)
        h_c = jnp.concatenate([h_c, enc_d_rep], axis=0)
    h_c = jnp.maximum(dense(h_c, n_layers + 1), 0.0).astype(compute_dtype)
    rgb = jax.nn.sigmoid(dense(h_c, n_layers + 2))  # (3, P)

    one_m = jnp.exp(-sigma * delta) + TRANS_EPS
    alpha = 1.0 - (one_m - TRANS_EPS)
    from tinynerf_tpu.kernels.scans import prefix_product_exclusive, sum_over_samples

    trans = prefix_product_exclusive(one_m, S, TR)
    w = alpha * trans  # (1, P)
    out_ref[:] = sum_over_samples(
        jnp.concatenate([rgb * w, w], axis=0), S, TR
    )  # (4, TR): comp_raw rgb + acc

    if emit_weights:
        w_ref[:] = w.reshape(S, TR)  # lane-split back to (S, TR)


def _prepare_nerf_weights(mlp_params, cfg: NeRFConfig):
    """Permute + transpose one NeRF MLP into kernel layout.

    Order: trunk layers (w,b)..., sigma (w,b), rgb_in (w,b), rgb (w,b).
    """
    perm = _encode_permutation(cfg.num_freqs)
    wbs = []
    layers = mlp_params["layers"]
    hidden = cfg.hidden
    for i, layer in enumerate(layers):
        w = layer["w"].astype(jnp.float32)
        if i == 0:
            w = jnp.take(w, perm, axis=0)
        elif i == cfg.skip_at:
            w = jnp.concatenate(
                [w[:hidden], jnp.take(w[hidden:], perm, axis=0)], axis=0
            )
        wbs.append(w.T)
        wbs.append(layer["b"].astype(jnp.float32).reshape(-1, 1))
    wbs.append(mlp_params["sigma"]["w"].astype(jnp.float32).T)  # (1, hidden)
    wbs.append(mlp_params["sigma"]["b"].astype(jnp.float32).reshape(1, 1))
    w_in = mlp_params["rgb_in"]["w"].astype(jnp.float32)  # (hidden+Dd, rgb_hidden)
    if cfg.use_viewdirs:
        perm_d = _dir_permutation(cfg.num_freqs_dir)
        w_in = jnp.concatenate(
            [w_in[:hidden], jnp.take(w_in[hidden:], perm_d, axis=0)], axis=0
        )
    wbs.append(w_in.T)  # (rgb_hidden, hidden+Dd)
    wbs.append(mlp_params["rgb_in"]["b"].astype(jnp.float32).reshape(-1, 1))
    wbs.append(mlp_params["rgb"]["w"].astype(jnp.float32).T)  # (3, rgb_hidden)
    wbs.append(mlp_params["rgb"]["b"].astype(jnp.float32).reshape(3, 1))
    return wbs


def fused_nerf_render_rays(
    mlp_params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    z_vals: Optional[jax.Array] = None,
    *,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    white_bkgd: bool = True,
    cfg: NeRFConfig = NeRFConfig(),
    return_weights: bool = False,
    tile_r: int = DEFAULT_TILE_R,
    interpret: Optional[bool] = None,
):
    """One fused NeRF-MLP render pass over a ray batch.

    z_vals: optional (R, S) per-ray depths (e.g. the hierarchical
    union); None uses the deterministic stratified linspace. Returns
    comp_rgb (R, 3), plus weights (R, S) when return_weights.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = rays_o.shape[0]
    S = z_vals.shape[1] if z_vals is not None else n_samples
    n_tiles = -(-R // tile_r)
    pad = n_tiles * tile_r - R
    o_t = jnp.pad(rays_o.astype(jnp.float32), ((0, pad), (0, 0))).T
    d_t = jnp.concatenate(
        [rays_d.astype(jnp.float32), jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))],
        axis=0,
    ).T

    inputs = [o_t, d_t]
    wbs = _prepare_nerf_weights(mlp_params, cfg)

    kernel = functools.partial(
        _nerf_kernel,
        S=S,
        has_z=z_vals is not None,
        emit_weights=return_weights,
        num_freqs=cfg.num_freqs,
        num_freqs_dir=cfg.num_freqs_dir,
        use_viewdirs=cfg.use_viewdirs,
        n_layers=cfg.depth,
        skip_at=cfg.skip_at,
        near=float(near),
        far=float(far),
        compute_dtype=cfg.compute_dtype,
    )

    ray_spec = lambda rows: pl.BlockSpec(
        (rows, tile_r), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [ray_spec(3), ray_spec(3)]
    if z_vals is not None:
        z_t = jnp.pad(z_vals.astype(jnp.float32), ((0, pad), (0, 0))).T  # (S, R')
        inputs.append(z_t)
        in_specs.append(ray_spec(S))
    in_specs += [full() for _ in wbs]

    out_shapes = [jax.ShapeDtypeStruct((4, R + pad), jnp.float32)]
    out_specs = [ray_spec(4)]
    if return_weights:
        out_shapes.append(jax.ShapeDtypeStruct((S, R + pad), jnp.float32))
        out_specs.append(ray_spec(S))

    pts = (R + pad) * S
    mac = sum(int(np.prod(w.shape)) for w in wbs[::2])
    cost = pl.CostEstimate(
        flops=int(2 * pts * mac * 1.1),
        bytes_accessed=(R + pad) * (6 + 4 + (S if z_vals is not None else 0)) * 4,
        transcendentals=pts * (6 * cfg.num_freqs + 6),
    )

    outs = pl.pallas_call(
        lambda *a: kernel(*a),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs if return_weights else out_specs[0],
        out_shape=out_shapes if return_weights else out_shapes[0],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *wbs)

    out4 = (outs[0] if return_weights else outs).T  # (R', 4)
    comp = out4[:R, :3]
    if white_bkgd:
        comp = comp + (1.0 - out4[:R, 3:4])
    if return_weights:
        return comp, outs[1].T[:R]  # (R, S)
    return comp


def fused_render_rays_hierarchical(
    params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    *,
    n_coarse: int = 64,
    n_fine: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    white_bkgd: bool = True,
    cfg: NeRFConfig = NeRFConfig(),
    tile_r: int = DEFAULT_TILE_R,
    interpret: Optional[bool] = None,
    sample_block: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fully-fused deterministic coarse->resample->fine pipeline.

    Matches models/nerf.render_rays_hierarchical(randomized=False): the
    only XLA ops between the two fused passes are the inverse-CDF
    resample and a sort over (R, S)-sized depth arrays.

    Large unions (or wide MLPs) route the fine pass through the
    STREAMED forward kernel (kernels/fused_nerf_stream.py) so VMEM
    stays O(sample_block); `sample_block` forces it explicitly.
    """
    from tinynerf_tpu.ops.sampling import sample_pdf

    comp_c, weights = fused_nerf_render_rays(
        params["coarse"],
        rays_o,
        rays_d,
        n_samples=n_coarse,
        near=near,
        far=far,
        white_bkgd=white_bkgd,
        cfg=cfg,
        return_weights=True,
        tile_r=tile_r,
        interpret=interpret,
    )
    t = jnp.linspace(0.0, 1.0, n_coarse, dtype=jnp.float32)
    z_c = jnp.broadcast_to(near * (1.0 - t) + far * t, (rays_o.shape[0], n_coarse))
    z_mids = 0.5 * (z_c[:, 1:] + z_c[:, :-1])
    z_f = sample_pdf(z_mids, weights[:, 1:-1], n_fine, randomized=False)
    z_union = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
    s_union = n_coarse + n_fine
    if sample_block is not None or cfg.hidden * s_union > 128 * 384:
        from tinynerf_tpu.kernels.fused_nerf_stream import (
            DEFAULT_SAMPLE_BLOCK,
            fused_nerf_render_rays_streamed,
        )

        if sample_block is None:
            sample_block = next(
                b
                for b in range(min(DEFAULT_SAMPLE_BLOCK, s_union), 0, -1)
                if s_union % b == 0 and (b % 8 == 0 or b == s_union)
            )
        comp_f = fused_nerf_render_rays_streamed(
            params["fine"],
            rays_o,
            rays_d,
            z_union,
            white_bkgd=white_bkgd,
            cfg=cfg,
            tile_r=tile_r,
            sample_block=sample_block,
            interpret=interpret,
        )
    else:
        comp_f = fused_nerf_render_rays(
            params["fine"],
            rays_o,
            rays_d,
            z_union,
            near=near,
            far=far,
            white_bkgd=white_bkgd,
            cfg=cfg,
            tile_r=tile_r,
            interpret=interpret,
        )
    return comp_c, comp_f
