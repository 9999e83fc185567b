"""Fused NeRF-MLP kernels that emit blockwise composite PARTIALS —
the fused-kernel <-> sample-parallel composition.

The sharded hierarchical loss (parallel/train.py) shards the per-ray
sample axis over the mesh's 'sample' axis: each device runs the MLP on
its sample shard, summarizes it with the associative block composite
(ops/volume.py composite_block_partials: T, C, D, A per ray), and the
tiny summaries are all_gather'd and combined. Until round 3 that path
was XLA-only — the fused Pallas kernels computed the WHOLE composite
(and its loss) in-kernel, so they could not sit under a sample mesh.

This module closes that gap with a kernel pair wrapped in a
jax.custom_vjp whose primal output is the block-partials pytree:

- FORWARD (`_partials_fwd_kernel`): the streamed forward of
  kernels/fused_nerf_stream.py, but instead of closing the composite it
  emits the shard's partials (C, A, T, D per ray), the block-LOCAL
  weights (optional — the coarse pass needs them for hierarchical
  resampling), and the per-stream-block entry transmittances as
  residuals for the backward.
- BACKWARD (`_partials_bwd_kernel`): consumes the COTANGENTS of the
  partials (g_C, g_A, g_T, g_D, and optionally g_w). Within the shard
  it is the same reverse-block stream as the loss kernel's backward
  (rematerialized activations, exclusive suffix accumulator), with two
  deltas: the per-ray composite cotangent is an arbitrary input rather
  than 2*(comp-target)/N, and the suffix accumulator is SEEDED with
  g_T * T_shard (the shard transmittance's product rule) instead of 0.

Because the primal is the partials pytree, `jax.grad` of the sharded
loss flows through the XLA all_gather + combine_block_partials
(differentiable collectives) and hands this kernel exactly the
cross-shard coupling terms — no collective choreography in-kernel.
VMEM stays O(sample_block); the sample axis scales first in-kernel
(streaming) and then across devices (this module), multiplicatively.

Semantics contract: composite_block_partials/combine_block_partials
(ops/volume.py:93-143), i.e. the reference rendering equation
/root/reference/src/volume.py:3-44 split at shard boundaries (1e-10
transmittance eps; the 1e10 terminal delta arrives via the caller's
global_deltas slice). Exact-parity tests: tests/test_fused_partials.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynerf_tpu.kernels.fused_nerf import _prepare_nerf_weights
from tinynerf_tpu.kernels.fused_nerf_train import kernel_grads_to_pytree
from tinynerf_tpu.kernels.fused_render import _iota2
from tinynerf_tpu.kernels.scans import (
    prefix_product_exclusive,
    suffix_sum_exclusive,
    sum_over_samples,
)
from tinynerf_tpu.models.nerf import NeRFConfig
from tinynerf_tpu.ops.volume import TRANS_EPS

DEFAULT_TILE_R = 128
DEFAULT_SAMPLE_BLOCK = 128


def _fourier(x, n_freqs):
    f32 = jnp.float32
    r_ids = _iota2((3 * n_freqs, 3), 0)
    c_ids = _iota2((3 * n_freqs, 3), 1)
    B = jnp.where(r_ids % 3 == c_ids, jnp.exp2((r_ids // 3).astype(f32)), 0.0)
    th = jnp.dot(
        B, x, preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.concatenate([x, jnp.sin(th), jnp.cos(th)], axis=0)


def _partials_fwd_kernel(
    o_ref,  # (3, R)
    d_ref,  # (3, R)
    z_ref,  # (S, R) shard depths (sorted per ray)
    dl_ref,  # (S, R) GLOBAL deltas sliced to this shard, * |d|
    noise_ref,  # (S, R) pre-ReLU density noise (zeros when off)
    *args,  # weight refs + out refs + 2 scratch refs
    TR: int,
    n_tiles: int,
    S: int,
    SB: int,
    emit_weights: bool,
    num_freqs: int,
    num_freqs_dir: int,
    use_viewdirs: bool,
    n_layers: int,
    skip_at: int,
    compute_dtype,
):
    acts_scr, enc_scr, tin_scr = args[-3:]
    args = args[:-3]
    n_wb = 2 * (n_layers + 3)
    wb = args[:n_wb]
    out_ref = args[n_wb]  # (6, R): C(3), A, T, D
    tin_ref = args[n_wb + 1]  # (NB, R) entry transmittance residuals
    w_ref = args[n_wb + 2] if emit_weights else None  # (S, R)

    NB = S // SB
    TRB = TR * SB
    f32 = jnp.float32
    s_row = _iota2((1, TRB), 1) // TR

    def dense(h_c, i):
        return (
            jnp.dot(
                wb[2 * i][:].astype(compute_dtype), h_c,
                preferred_element_type=f32,
            )
            + wb[2 * i + 1][:]
        )

    I_SIG, I_IN, I_RGB = n_layers, n_layers + 1, n_layers + 2

    def tile_body(ti, _):
        start = pl.multiple_of(ti * TR, TR)
        sl = pl.ds(start, TR)
        o_t, d_t = o_ref[:, sl], d_ref[:, sl]
        norm = jnp.sqrt(jnp.sum(d_t * d_t, axis=0, keepdims=True))
        od_rep = pltpu.repeat(jnp.concatenate([o_t, d_t], axis=0), SB, axis=1)
        if use_viewdirs:
            enc_d_rep = pltpu.repeat(
                _fourier(d_t / norm, num_freqs_dir), SB, axis=1
            ).astype(compute_dtype)

        def fwd_body(b, carry):
            T_run, C, A, D = carry
            # Full-row dynamic store into the tiny (NB, TR) scratch —
            # real Mosaic rejects a dynamic SUBLANE index combined with
            # a lane slice on the (NB, R) output ("dynamic store with
            # unaligned indices", first on-chip compile r4); the
            # scratch rows are copied out with static indices below.
            tin_scr[pl.ds(b, 1)] = T_run
            zsl = pl.ds(pl.multiple_of(b * SB, SB), SB)
            z_row = z_ref[zsl, sl].reshape(1, TRB)
            delta = dl_ref[zsl, sl].reshape(1, TRB)
            pts = od_rep[0:3] + od_rep[3:6] * z_row
            enc_scr[:] = _fourier(pts, num_freqs).astype(compute_dtype)
            h = enc_scr[:]
            for i in range(n_layers):
                h_in = h if i != skip_at else jnp.concatenate(
                    [h, enc_scr[:]], axis=0
                )
                h = jnp.maximum(dense(h_in, i), 0.0).astype(compute_dtype)
                acts_scr[i] = h
            sigma_raw = dense(h, I_SIG) + noise_ref[zsl, sl].reshape(1, TRB)
            sigma = jnp.maximum(sigma_raw, 0.0)
            rgb_in_input = (
                jnp.concatenate([h, enc_d_rep], axis=0) if use_viewdirs else h
            )
            g1 = jnp.maximum(dense(rgb_in_input, I_IN), 0.0).astype(compute_dtype)
            rgb = jax.nn.sigmoid(dense(g1, I_RGB))
            one_m = jnp.exp(-sigma * delta) + TRANS_EPS
            alpha = 1.0 - (one_m - TRANS_EPS)
            tl = prefix_product_exclusive(one_m, SB, TR)  # block-LOCAL
            w = alpha * pltpu.repeat(T_run, SB, axis=1) * tl  # shard-local
            if emit_weights:
                w_ref[zsl, sl] = w.reshape(SB, TR)
            A5 = sum_over_samples(
                jnp.concatenate([rgb * w, w, w * z_row], axis=0), SB, TR
            )
            blk_prod = sum_over_samples(
                jnp.where(s_row == SB - 1, tl * one_m, 0.0), SB, TR
            )
            return T_run * blk_prod, C + A5[0:3], A + A5[3:4], D + A5[4:5]

        T, C, A, D = jax.lax.fori_loop(
            0,
            NB,
            fwd_body,
            (
                jnp.ones((1, TR), f32),
                jnp.zeros((3, TR), f32),
                jnp.zeros((1, TR), f32),
                jnp.zeros((1, TR), f32),
            ),
        )
        out_ref[0:3, sl] = C
        out_ref[3:4, sl] = A
        out_ref[4:5, sl] = T
        out_ref[5:6, sl] = D
        tin_ref[:, sl] = tin_scr[:]
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _partials_bwd_kernel(
    o_ref,  # (3, R)
    d_ref,  # (3, R)
    z_ref,  # (S, R)
    dl_ref,  # (S, R)
    noise_ref,  # (S, R)
    tin_ref,  # (NB, R) fwd residual: per-stream-block entry transmittance
    gc_ref,  # (3, R) cotangent of C
    gad_ref,  # (2, R) cotangents of [A, D]
    seed_ref,  # (1, R) g_T * T_shard — the suffix accumulator's seed
    *args,  # [gw_ref (S, R)]? + weight refs + grad-output refs + scratch
    TR: int,
    n_tiles: int,
    S: int,
    SB: int,
    has_gw: bool,
    hidden: int,
    num_freqs: int,
    num_freqs_dir: int,
    use_viewdirs: bool,
    n_layers: int,
    skip_at: int,
    compute_dtype,
):
    acts_scr, enc_scr, tin_scr = args[-3:]
    args = args[:-3]
    if has_gw:
        gw_ref, args = args[0], args[1:]
    n_wb = 2 * (n_layers + 3)
    wb = args[:n_wb]
    g_refs = args[n_wb : n_wb + n_wb]

    NB = S // SB
    TRB = TR * SB
    f32 = jnp.float32

    def dense(h_c, i):
        return (
            jnp.dot(
                wb[2 * i][:].astype(compute_dtype), h_c,
                preferred_element_type=f32,
            )
            + wb[2 * i + 1][:]
        )

    I_SIG, I_IN, I_RGB = n_layers, n_layers + 1, n_layers + 2

    def act(i):
        return enc_scr[:] if i == 0 else acts_scr[i - 1]

    def tile_grads(ti, grads):
        start = pl.multiple_of(ti * TR, TR)
        sl = pl.ds(start, TR)
        o_t, d_t = o_ref[:, sl], d_ref[:, sl]
        norm = jnp.sqrt(jnp.sum(d_t * d_t, axis=0, keepdims=True))
        od_rep = pltpu.repeat(jnp.concatenate([o_t, d_t], axis=0), SB, axis=1)
        if use_viewdirs:
            enc_d_rep = pltpu.repeat(
                _fourier(d_t / norm, num_freqs_dir), SB, axis=1
            ).astype(compute_dtype)

        def block_forward(b):
            """Rematerialize block b's forward; activations in scratch."""
            zsl = pl.ds(pl.multiple_of(b * SB, SB), SB)
            z_row = z_ref[zsl, sl].reshape(1, TRB)
            delta = dl_ref[zsl, sl].reshape(1, TRB)
            pts = od_rep[0:3] + od_rep[3:6] * z_row
            enc_scr[:] = _fourier(pts, num_freqs).astype(compute_dtype)
            h = enc_scr[:]
            for i in range(n_layers):
                h_in = h if i != skip_at else jnp.concatenate(
                    [h, enc_scr[:]], axis=0
                )
                h = jnp.maximum(dense(h_in, i), 0.0).astype(compute_dtype)
                acts_scr[i] = h
            sigma_raw = dense(h, I_SIG) + noise_ref[zsl, sl].reshape(1, TRB)
            sigma = jnp.maximum(sigma_raw, 0.0)
            rgb_in_input = (
                jnp.concatenate([h, enc_d_rep], axis=0) if use_viewdirs else h
            )
            g1 = jnp.maximum(dense(rgb_in_input, I_IN), 0.0).astype(compute_dtype)
            rgb = jax.nn.sigmoid(dense(g1, I_RGB))
            one_m = jnp.exp(-sigma * delta) + TRANS_EPS
            alpha = 1.0 - (one_m - TRANS_EPS)
            tl = prefix_product_exclusive(one_m, SB, TR)
            return z_row, delta, sigma, g1, rgb, rgb_in_input, one_m, alpha, tl

        g3 = pltpu.repeat(gc_ref[:, sl], SB, axis=1)  # (3, TRB)
        gA_rep = pltpu.repeat(gad_ref[0:1, sl], SB, axis=1)
        gD_rep = pltpu.repeat(gad_ref[1:2, sl], SB, axis=1)
        # Static copy of this tile's residual columns; rows are then
        # read with the (chip-proven) full-row dynamic scratch index —
        # see the matching store-side note in the forward kernel.
        tin_scr[:] = tin_ref[:, sl]

        def bwd_body(j, carry):
            suf_carry, grads = carry
            b = NB - 1 - j
            (z_row, delta, sigma, g1, rgb, rgb_in_input, one_m, alpha,
             tl) = block_forward(b)
            zsl = pl.ds(pl.multiple_of(b * SB, SB), SB)
            T_in = tin_scr[pl.ds(b, 1)]  # (1, TR)
            trans = pltpu.repeat(T_in, SB, axis=1) * tl  # shard-local
            w = alpha * trans

            g_rgb = g3 * w
            g_w = jnp.sum(g3 * rgb, axis=0, keepdims=True) + gA_rep
            g_w = g_w + gD_rep * z_row
            if has_gw:
                g_w = g_w + gw_ref[zsl, sl].reshape(1, TRB)
            g_alpha = g_w * trans
            g_trans = g_w * alpha
            x = g_trans * trans
            # Exclusive suffix over the WHOLE shard: local suffix + the
            # carried sum over later blocks; seeded with g_T * T_shard
            # (every one_m divides the shard transmittance product).
            suf = suffix_sum_exclusive(x, SB, TR) + pltpu.repeat(
                suf_carry, SB, axis=1
            )
            suf_carry = suf_carry + sum_over_samples(x, SB, TR)
            g_one_m = suf / one_m - g_alpha
            g_sigma = g_one_m * (-(delta) * (one_m - TRANS_EPS))

            new = [None] * n_wb

            def dbwd(g_c, i, h_in_c, keep_in=None):
                new[2 * i] = jax.lax.dot_general(
                    g_c, h_in_c, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
                new[2 * i + 1] = jnp.sum(g_c.astype(f32), axis=1, keepdims=True)
                w_full = wb[2 * i][:]
                w_up = w_full if keep_in is None else w_full[:, :keep_in]
                return jax.lax.dot_general(
                    w_up.astype(compute_dtype), g_c,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ).astype(compute_dtype)

            g_rgbpre = (g_rgb * rgb * (1.0 - rgb)).astype(compute_dtype)
            g_g1 = dbwd(g_rgbpre, I_RGB, g1)
            g_a1 = g_g1 * (g1.astype(f32) > 0).astype(compute_dtype)
            g_h_rgb = dbwd(g_a1, I_IN, rgb_in_input, keep_in=hidden)
            g_sigpre = (g_sigma * (sigma > 0)).astype(compute_dtype)
            g_h_sig = dbwd(g_sigpre, I_SIG, act(n_layers))
            g = g_h_rgb + g_h_sig
            for i in reversed(range(n_layers)):
                g = g * (acts_scr[i].astype(f32) > 0).astype(compute_dtype)
                h_in = act(i) if i != skip_at else jnp.concatenate(
                    [act(i), enc_scr[:]], axis=0
                )
                g = dbwd(g, i, h_in, keep_in=hidden if i == skip_at else None)
            return suf_carry, [a + n for a, n in zip(grads, new)]

        _, grads = jax.lax.fori_loop(
            0, NB, bwd_body, (seed_ref[:, sl], grads)
        )
        return grads

    g0 = []
    for i in range(n_wb // 2):
        g0.append(jnp.zeros(wb[2 * i].shape, f32))
        g0.append(jnp.zeros((wb[2 * i].shape[0], 1), f32))

    total_grads = jax.lax.fori_loop(0, n_tiles, tile_grads, g0)
    for ref, g in zip(g_refs, total_grads):
        ref[:] = g


def _check_shapes(R, S, tile_r, sample_block):
    tile_r = min(tile_r, R)
    if R % tile_r:
        raise ValueError(
            f"n_rays={R} must be a multiple of tile_r={tile_r} (the "
            f"partials kernels do not pad: per-device ray shards are "
            f"caller-aligned)"
        )
    sample_block = min(sample_block, S)
    if S % sample_block:
        raise ValueError(
            f"shard sample count S={S} must be a multiple of "
            f"sample_block={sample_block}"
        )
    return tile_r, sample_block


def make_fused_block_partials_fn(
    cfg: NeRFConfig = NeRFConfig(),
    *,
    emit_weights: bool = False,
    tile_r: int = DEFAULT_TILE_R,
    sample_block: int = DEFAULT_SAMPLE_BLOCK,
    interpret=None,
):
    """-> f(mlp_params, rays_o, rays_d, z_vals, deltas, sigma_noise)
    returning (partials, local_weights|None), differentiable w.r.t.
    mlp_params via the fused backward kernel.

    Drop-in for ops/volume.composite_block_partials over an
    XLA-computed MLP: `partials` is the same {T, C, D, A} pytree (per
    ray over THIS shard's z_vals), `local_weights` (when emit_weights)
    the same alpha*within-shard-transmittance. deltas must be the
    caller's global_deltas slice (they see the next shard's first z and
    the 1e10 terminal). sigma_noise (R, S): pre-ReLU density noise,
    zeros when off (kept positional so one compiled program serves the
    decay schedule).

    Gradients flow to mlp_params only (rays/z/deltas/noise get zeros —
    they are data or stop_gradient'd resampling products in every
    caller, matching the other fused train kernels).
    """

    def _fwd(mlp_params, ro, rd, z_vals, deltas, noise):
        inter = jax.default_backend() != "tpu" if interpret is None else interpret
        R, S = z_vals.shape
        tr, sb = _check_shapes(R, S, tile_r, sample_block)
        NB = S // sb
        f32 = jnp.float32
        inputs = [
            ro.astype(f32).T,
            rd.astype(f32).T,
            z_vals.astype(f32).T,
            deltas.astype(f32).T,
            noise.astype(f32).T,
        ]
        wbs = _prepare_nerf_weights(mlp_params, cfg)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shapes = [
            jax.ShapeDtypeStruct((6, R), f32),
            jax.ShapeDtypeStruct((NB, R), f32),
        ]
        if emit_weights:
            out_shapes.append(jax.ShapeDtypeStruct((S, R), f32))
        kernel = functools.partial(
            _partials_fwd_kernel,
            TR=tr,
            n_tiles=R // tr,
            S=S,
            SB=sb,
            emit_weights=emit_weights,
            num_freqs=cfg.num_freqs,
            num_freqs_dir=cfg.num_freqs_dir,
            use_viewdirs=cfg.use_viewdirs,
            n_layers=cfg.depth,
            skip_at=cfg.skip_at,
            compute_dtype=cfg.compute_dtype,
        )
        mac = sum(int(np.prod(w.shape)) for w in wbs[::2])
        cost = pl.CostEstimate(
            flops=2 * R * S * mac,
            bytes_accessed=R * (9 + (4 + emit_weights) * S) * 4,
            transcendentals=R * S * (6 * cfg.num_freqs + 6),
        )
        TRB = tr * sb
        enc_dim = 3 + 6 * cfg.num_freqs
        outs = pl.pallas_call(
            lambda *a: kernel(*a),
            in_specs=[full() for _ in inputs] + [full() for _ in wbs],
            out_specs=[full() for _ in out_shapes],
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((cfg.depth, cfg.hidden, TRB), cfg.compute_dtype),
                pltpu.VMEM((enc_dim, TRB), cfg.compute_dtype),
                pltpu.VMEM((NB, tr), f32),
            ],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
            interpret=inter,
        )(*inputs, *wbs)
        out6, tin = outs[0], outs[1]
        partials = {
            "T": out6[4],
            "C": out6[0:3].T,
            "D": out6[5],
            "A": out6[3],
        }
        w_local = outs[2].T[:, :S] if emit_weights else None
        return (partials, w_local), tin

    @jax.custom_vjp
    def f(mlp_params, ro, rd, z_vals, deltas, noise):
        out, _ = _fwd(mlp_params, ro, rd, z_vals, deltas, noise)
        return out

    def f_fwd(mlp_params, ro, rd, z_vals, deltas, noise):
        (partials, w_local), tin = _fwd(mlp_params, ro, rd, z_vals, deltas, noise)
        res = (mlp_params, ro, rd, z_vals, deltas, noise, tin, partials["T"])
        return (partials, w_local), res

    def f_bwd(res, ct):
        mlp_params, ro, rd, z_vals, deltas, noise, tin, T_shard = res
        g_partials, g_w = ct
        inter = jax.default_backend() != "tpu" if interpret is None else interpret
        R, S = z_vals.shape
        tr, sb = _check_shapes(R, S, tile_r, sample_block)
        f32 = jnp.float32
        gc = g_partials["C"].astype(f32).T  # (3, R)
        gad = jnp.stack(
            [g_partials["A"].astype(f32), g_partials["D"].astype(f32)], axis=0
        )  # (2, R)
        seed = (g_partials["T"].astype(f32) * T_shard)[None, :]  # (1, R)
        inputs = [
            ro.astype(f32).T,
            rd.astype(f32).T,
            z_vals.astype(f32).T,
            deltas.astype(f32).T,
            noise.astype(f32).T,
            tin,
            gc,
            gad,
            seed,
        ]
        if emit_weights:
            inputs.append(g_w.astype(f32).T)  # (S, R)
        wbs = _prepare_nerf_weights(mlp_params, cfg)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shapes = [jax.ShapeDtypeStruct(w.shape, f32) for w in wbs]
        kernel = functools.partial(
            _partials_bwd_kernel,
            TR=tr,
            n_tiles=R // tr,
            S=S,
            SB=sb,
            has_gw=emit_weights,
            hidden=cfg.hidden,
            num_freqs=cfg.num_freqs,
            num_freqs_dir=cfg.num_freqs_dir,
            use_viewdirs=cfg.use_viewdirs,
            n_layers=cfg.depth,
            skip_at=cfg.skip_at,
            compute_dtype=cfg.compute_dtype,
        )
        mac = sum(int(np.prod(w.shape)) for w in wbs[::2])
        cost = pl.CostEstimate(
            # remat forward + 2 backward matmul families ~ 3 fwd-equiv.
            flops=2 * 3 * R * S * mac,
            bytes_accessed=R * (15 + (4 + emit_weights) * S) * 4 + 2 * mac * 4,
            transcendentals=R * S * (6 * cfg.num_freqs + 6),
        )
        TRB = tr * sb
        enc_dim = 3 + 6 * cfg.num_freqs
        outs = pl.pallas_call(
            lambda *a: kernel(*a),
            in_specs=[full() for _ in inputs] + [full() for _ in wbs],
            out_specs=[full() for _ in out_shapes],
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((cfg.depth, cfg.hidden, TRB), cfg.compute_dtype),
                pltpu.VMEM((enc_dim, TRB), cfg.compute_dtype),
                pltpu.VMEM((S // sb, tr), f32),
            ],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
            interpret=inter,
        )(*inputs, *wbs)
        g_mlp = kernel_grads_to_pytree(list(outs), cfg)
        zeros = lambda x: jnp.zeros_like(x)
        return (g_mlp, zeros(ro), zeros(rd), zeros(z_vals), zeros(deltas),
                zeros(noise))

    f.defvjp(f_fwd, f_bwd)
    return f
