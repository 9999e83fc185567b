"""Sample-block-STREAMED fused Pallas train kernel for the NeRF MLP.

The monolithic kernel (kernels/fused_nerf_train.py) keeps the whole
(ray_tile x S) activation set live through the backward: at 2048x192
that is already ~55MB of VMEM scratch and S=512 is unreachable. This
kernel is the in-kernel analog of the XLA blockwise composite
(ops/volume.py:91-171), flash-attention-style, so VMEM scratch is
O(sample_block), not O(S):

- FORWARD stream over sample blocks b = 0..NB-1: recompute the block's
  points -> encoding -> MLP -> (rgb, sigma, alpha), take the block's
  LOCAL exclusive transmittance prefix, scale it by the carried entry
  transmittance T_run, and accumulate (comp_rgb C, acc A). The entry
  transmittance of every block is stashed in a tiny (NB, TR) scratch.
- The loss/residual closes over the streamed composite exactly as the
  monolithic kernel does over the full one.
- BACKWARD stream in REVERSE block order: rematerialize the block's
  forward (activations now O(block) in scratch), rebuild its true
  transmittance from the stashed entry value, and form the global
  suffix term sum_{j>i} g_trans_j * trans_j as (local exclusive suffix
  sum) + (carried cross-block suffix accumulator). Parameter gradients
  accumulate across blocks and ray tiles in registers/VMEM and are
  written once.

Cost: one extra forward (rematerialization) per step — ~4/3 the FLOPs
of the monolithic kernel — in exchange for sample counts bounded by HBM
(z fits) instead of VMEM. Exact gradient parity with jax.grad of the
unfused loss is asserted in tests/test_fused_nerf_stream.py.

Scope: the hierarchical FINE pass (caller-provided sorted depth union,
deterministic — where large S actually occurs). The coarse pass at
S=64 stays on the monolithic kernel with its in-register PRNG jitter.

Reference lineage: the composite semantics are the NeRF rendering
equation of /root/reference/src/volume.py:3-44 (1e10 terminal delta,
1e-10 eps, white background); the reference has no large-sample or
streaming machinery (its only scaling axis is ray chunking,
src/train.py:48).
"""

from __future__ import annotations

import functools
from typing import Optional

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
from tinynerf_tpu.ops.volume import DELTA_INF, TRANS_EPS

DEFAULT_TILE_R = 128
# 64 beats 128 at the S=512 streamed train recipe on-chip: 127.8k vs
# 121.4k rays/s (+5.3%, benchmarks/r4/tile_sweep.json nerf_s512_block);
# 256 fails Mosaic compilation (scoped-vmem). Smaller blocks trade a
# few more scan iterations for less VMEM pressure per step.
DEFAULT_SAMPLE_BLOCK = 64


def pick_sample_block(S: int, cap: int = DEFAULT_SAMPLE_BLOCK) -> int:
    """Largest divisor of S that is <= cap — the streamed kernels
    require sample_block | S (e.g. S=192 -> 64; S=448 with cap=128
    -> 112).

    A pathological S (e.g. prime, from an arbitrary eval --n-fine)
    only has tiny divisors, making the kernel run S/b inner blocks —
    functionally correct but far off the speed-of-light block size, so
    warn instead of silently degrading (ADVICE r3)."""
    for b in range(min(cap, S), 0, -1):
        if S % b == 0:
            if b < 8 and S > 8:
                import warnings

                warnings.warn(
                    f"pick_sample_block: S={S} has no divisor in [8, {cap}];"
                    f" streaming in blocks of {b} ({S // b} inner blocks) will"
                    " be slow — prefer a composite sample count (e.g. a"
                    " multiple of 64)"
                )
            return b
    return S


def _streamed_kernel(
    o_ref,  # (3, R) ray origins (transposed)
    d_ref,  # (3, R) ray directions
    t_ref,  # (3, R) target rgb
    z_ref,  # (S, R) depths (sorted per ray)
    dl_ref,  # (S, R) deltas (diff(z), DELTA_INF last) * |d|, precomputed
    *args,  # [noise_ref (S, R)]? + weight refs + output refs + 3 scratch refs
    TR: int,
    n_tiles: int,
    S: int,
    SB: int,
    has_noise: bool,
    hidden: int,
    num_freqs: int,
    num_freqs_dir: int,
    use_viewdirs: bool,
    n_layers: int,
    skip_at: int,
    white_bkgd: bool,
    inv_n: float,
    compute_dtype,
    peel: bool,
):
    acts_scr, enc_scr, tin_scr = args[-3:]
    args = args[:-3]
    if has_noise:
        noise_ref, args = args[0], args[1:]
    n_wb = 2 * (n_layers + 3)
    wb = args[:n_wb]
    loss_ref = args[n_wb]
    g_refs = args[n_wb + 1 : n_wb + 1 + n_wb]

    NB = S // SB
    TRB = TR * SB
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST
    s_row = _iota2((1, TRB), 1) // TR  # sample index WITHIN the block

    def fourier(x, n_freqs):
        r_ids = _iota2((3 * n_freqs, 3), 0)
        c_ids = _iota2((3 * n_freqs, 3), 1)
        B = jnp.where(r_ids % 3 == c_ids, jnp.exp2((r_ids // 3).astype(f32)), 0.0)
        th = jnp.dot(B, x, preferred_element_type=f32, precision=HI)
        return jnp.concatenate([x, jnp.sin(th), jnp.cos(th)], axis=0)

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
        """Input of trunk layer i (enc for i=0), from scratch."""
        return enc_scr[:] if i == 0 else acts_scr[i - 1]

    def tile_grads(ti, loss_acc, grads):
        start = pl.multiple_of(ti * TR, TR)
        sl = pl.ds(start, TR)
        o_t, d_t, tgt = o_ref[:, sl], d_ref[:, sl], t_ref[:, sl]
        norm = jnp.sqrt(jnp.sum(d_t * d_t, axis=0, keepdims=True))  # (1, TR)
        od_rep = pltpu.repeat(jnp.concatenate([o_t, d_t], axis=0), SB, axis=1)
        if use_viewdirs:
            vdir = d_t / norm
            enc_d_rep = pltpu.repeat(
                fourier(vdir, num_freqs_dir), SB, axis=1
            ).astype(compute_dtype)  # (Dd, TRB), shared by every block

        def block_forward(b):
            """(Re)compute block b's forward; activations land in
            scratch (valid until the next block_forward call)."""
            zsl = pl.ds(pl.multiple_of(b * SB, SB), SB)
            z_row = z_ref[zsl, sl].reshape(1, TRB)  # lane-merge
            delta = dl_ref[zsl, sl].reshape(1, TRB)
            pts = od_rep[0:3] + od_rep[3:6] * z_row
            enc_scr[:] = fourier(pts, num_freqs).astype(compute_dtype)
            h = enc_scr[:]
            for i in range(n_layers):
                h_in = h if i != skip_at else jnp.concatenate(
                    [h, enc_scr[:]], axis=0
                )
                h = jnp.maximum(dense(h_in, i), 0.0).astype(compute_dtype)
                acts_scr[i] = h
            sigma_raw = dense(h, I_SIG)  # (1, TRB)
            if has_noise:
                # Same buffer read in fwd stream AND bwd remat -> the
                # rematerialized noisy forward is bit-consistent.
                sigma_raw = sigma_raw + noise_ref[zsl, sl].reshape(1, TRB)
            sigma = jnp.maximum(sigma_raw, 0.0)  # (1, TRB)
            rgb_in_input = (
                jnp.concatenate([h, enc_d_rep], axis=0) if use_viewdirs else h
            )
            g1 = jnp.maximum(dense(rgb_in_input, I_IN), 0.0).astype(compute_dtype)
            rgb = jax.nn.sigmoid(dense(g1, I_RGB))  # (3, TRB)
            one_m = jnp.exp(-sigma * delta) + TRANS_EPS
            alpha = 1.0 - (one_m - TRANS_EPS)
            tl = prefix_product_exclusive(one_m, SB, TR)  # block-LOCAL
            return delta, sigma, g1, rgb, rgb_in_input, one_m, alpha, tl

        def block_heads(b):
            """Heads-only twin of block_forward for a block whose trunk
            activations are ALREADY in scratch (the forward stream's
            last block): reads enc_scr/acts_scr instead of re-running
            encoding + trunk. Values are bit-identical — scratch holds
            exactly what the forward wrote."""
            zsl = pl.ds(pl.multiple_of(b * SB, SB), SB)
            delta = dl_ref[zsl, sl].reshape(1, TRB)
            h = act(n_layers)
            sigma_raw = dense(h, I_SIG)
            if has_noise:
                sigma_raw = sigma_raw + noise_ref[zsl, sl].reshape(1, TRB)
            sigma = jnp.maximum(sigma_raw, 0.0)
            rgb_in_input = (
                jnp.concatenate([h, enc_d_rep], axis=0) if use_viewdirs else h
            )
            g1 = jnp.maximum(dense(rgb_in_input, I_IN), 0.0).astype(compute_dtype)
            rgb = jax.nn.sigmoid(dense(g1, I_RGB))
            one_m = jnp.exp(-sigma * delta) + TRANS_EPS
            alpha = 1.0 - (one_m - TRANS_EPS)
            tl = prefix_product_exclusive(one_m, SB, TR)
            return delta, sigma, g1, rgb, rgb_in_input, one_m, alpha, tl

        # ---- forward stream: carried (T_run, C, A) ----
        def fwd_body(b, carry):
            T_run, C, A = carry
            tin_scr[pl.ds(b, 1)] = T_run  # entry transmittance of block b
            _, _, _, rgb, _, one_m, alpha, tl = block_forward(b)
            trans = pltpu.repeat(T_run, SB, axis=1) * tl
            w = alpha * trans
            A4 = sum_over_samples(jnp.concatenate([rgb * w, w], axis=0), SB, TR)
            # Inclusive product over the whole block = (exclusive prefix
            # * own factor) at the block's last sample.
            blk_prod = sum_over_samples(
                jnp.where(s_row == SB - 1, tl * one_m, 0.0), SB, TR
            )
            return T_run * blk_prod, C + A4[0:3], A + A4[3:4]

        T_run, C, A = jax.lax.fori_loop(
            0,
            NB,
            fwd_body,
            (
                jnp.ones((1, TR), f32),
                jnp.zeros((3, TR), f32),
                jnp.zeros((1, TR), f32),
            ),
        )
        comp = C + (1.0 - A) if white_bkgd else C
        resid = comp - tgt
        loss = jnp.sum(resid * resid) * inv_n
        g_comp = (2.0 * inv_n) * resid  # (3, TR)
        gw_const = (
            -jnp.sum(g_comp, axis=0, keepdims=True) if white_bkgd else None
        )  # d loss / d acc, constant per ray

        # ---- backward stream (reverse block order) ----
        def bwd_step(b, vals, suf_carry, grads):
            delta, sigma, g1, rgb, rgb_in_input, one_m, alpha, tl = vals
            T_in = tin_scr[pl.ds(b, 1)]  # (1, TR)
            trans = pltpu.repeat(T_in, SB, axis=1) * tl
            w = alpha * trans

            g3 = pltpu.repeat(g_comp, SB, axis=1)
            g_rgb = g3 * w
            g_w = jnp.sum(g3 * rgb, axis=0, keepdims=True)
            if white_bkgd:
                g_w = g_w + pltpu.repeat(gw_const, SB, axis=1)
            g_alpha = g_w * trans
            g_trans = g_w * alpha
            x = g_trans * trans
            # Global exclusive suffix = local exclusive suffix + the sum
            # over all LATER blocks (carried, since we walk in reverse).
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

        def bwd_body(j, carry):
            suf_carry, grads = carry
            b = NB - 1 - j
            return bwd_step(b, block_forward(b), suf_carry, grads)

        suf0 = jnp.zeros((1, TR), f32)
        if peel:
            # The forward stream's LAST block (b = NB-1) is the FIRST
            # block of the reverse walk, and its trunk activations are
            # still live in scratch — peel it out of the loop and skip
            # its encoding + trunk rematerialization (~1/NB of the remat
            # cost; e.g. ~10% of total matmul work at NB=2).
            suf0, grads = bwd_step(NB - 1, block_heads(NB - 1), suf0, grads)
        _, grads = jax.lax.fori_loop(
            1 if peel else 0, NB, bwd_body, (suf0, grads)
        )
        return loss_acc + loss, grads

    g0 = []
    for i in range(n_wb // 2):
        g0.append(jnp.zeros(wb[2 * i].shape, f32))
        g0.append(jnp.zeros((wb[2 * i].shape[0], 1), f32))

    def tile_body(ti, carry):
        loss_acc, grads = carry
        return tile_grads(ti, loss_acc, grads)

    total_loss, total_grads = jax.lax.fori_loop(
        0, n_tiles, tile_body, (jnp.float32(0.0), g0)
    )
    loss_ref[0, 0] = total_loss
    for ref, g in zip(g_refs, total_grads):
        ref[:] = g


def _streamed_render_kernel(
    o_ref,  # (3, R)
    d_ref,  # (3, R)
    z_ref,  # (S, R)
    dl_ref,  # (S, R)
    *args,  # weight refs + out ref + 2 scratch refs
    TR: int,
    n_tiles: int,
    S: int,
    SB: int,
    num_freqs: int,
    num_freqs_dir: int,
    use_viewdirs: bool,
    n_layers: int,
    skip_at: int,
    compute_dtype,
):
    """Forward-only streamed twin of _streamed_kernel: carries
    (T, comp, acc) across sample blocks; emits (4, R) raw composite."""
    acts_scr, enc_scr = args[-2:]
    args = args[:-2]
    n_wb = 2 * (n_layers + 3)
    wb = args[:n_wb]
    out_ref = args[n_wb]

    NB = S // SB
    TRB = TR * SB
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST
    s_row = _iota2((1, TRB), 1) // TR

    def fourier(x, n_freqs):
        r_ids = _iota2((3 * n_freqs, 3), 0)
        c_ids = _iota2((3 * n_freqs, 3), 1)
        B = jnp.where(r_ids % 3 == c_ids, jnp.exp2((r_ids // 3).astype(f32)), 0.0)
        th = jnp.dot(B, x, preferred_element_type=f32, precision=HI)
        return jnp.concatenate([x, jnp.sin(th), jnp.cos(th)], axis=0)

    def dense(h_c, i):
        return (
            jnp.dot(
                wb[2 * i][:].astype(compute_dtype), h_c,
                preferred_element_type=f32,
            )
            + wb[2 * i + 1][:]
        )

    I_SIG, I_IN, I_RGB = n_layers, n_layers + 1, n_layers + 2

    def tile_render(ti, _):
        start = pl.multiple_of(ti * TR, TR)
        sl = pl.ds(start, TR)
        o_t, d_t = o_ref[:, sl], d_ref[:, sl]
        norm = jnp.sqrt(jnp.sum(d_t * d_t, axis=0, keepdims=True))
        od_rep = pltpu.repeat(jnp.concatenate([o_t, d_t], axis=0), SB, axis=1)
        if use_viewdirs:
            enc_d_rep = pltpu.repeat(
                fourier(d_t / norm, num_freqs_dir), SB, axis=1
            ).astype(compute_dtype)

        def fwd_body(b, carry):
            T_run, C, A = carry
            zsl = pl.ds(pl.multiple_of(b * SB, SB), SB)
            z_row = z_ref[zsl, sl].reshape(1, TRB)
            delta = dl_ref[zsl, sl].reshape(1, TRB)
            pts = od_rep[0:3] + od_rep[3:6] * z_row
            enc_scr[:] = fourier(pts, num_freqs).astype(compute_dtype)
            h = enc_scr[:]
            for i in range(n_layers):
                h_in = h if i != skip_at else jnp.concatenate(
                    [h, enc_scr[:]], axis=0
                )
                h = jnp.maximum(dense(h_in, i), 0.0).astype(compute_dtype)
                acts_scr[i] = h
            sigma = jnp.maximum(dense(h, I_SIG), 0.0)
            rgb_in_input = (
                jnp.concatenate([h, enc_d_rep], axis=0) if use_viewdirs else h
            )
            g1 = jnp.maximum(dense(rgb_in_input, I_IN), 0.0).astype(compute_dtype)
            rgb = jax.nn.sigmoid(dense(g1, I_RGB))
            one_m = jnp.exp(-sigma * delta) + TRANS_EPS
            alpha = 1.0 - (one_m - TRANS_EPS)
            tl = prefix_product_exclusive(one_m, SB, TR)
            trans = pltpu.repeat(T_run, SB, axis=1) * tl
            w = alpha * trans
            A4 = sum_over_samples(jnp.concatenate([rgb * w, w], axis=0), SB, TR)
            blk_prod = sum_over_samples(
                jnp.where(s_row == SB - 1, tl * one_m, 0.0), SB, TR
            )
            return T_run * blk_prod, C + A4[0:3], A + A4[3:4]

        _, C, A = jax.lax.fori_loop(
            0,
            NB,
            fwd_body,
            (
                jnp.ones((1, TR), f32),
                jnp.zeros((3, TR), f32),
                jnp.zeros((1, TR), f32),
            ),
        )
        out_ref[:, sl] = jnp.concatenate([C, A], axis=0)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_render, 0)


def fused_nerf_render_rays_streamed(
    mlp_params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    z_vals: jax.Array,
    *,
    white_bkgd: bool = True,
    cfg: NeRFConfig = NeRFConfig(),
    tile_r: int = DEFAULT_TILE_R,
    sample_block: int = DEFAULT_SAMPLE_BLOCK,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Streamed forward render over a caller-provided depth union ->
    comp_rgb (R, 3). Drop-in for fused_nerf_render_rays(z_vals=...)
    when S is large (the fine pass of a high-sample hierarchical
    render): VMEM scratch is O(sample_block), not O(S)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, S = z_vals.shape
    tile_r = min(tile_r, R)
    n_tiles = -(-R // tile_r)
    pad = n_tiles * tile_r - R
    sample_block = min(sample_block, S)
    if S % sample_block:
        raise ValueError(
            f"S={S} must be a multiple of sample_block={sample_block}"
        )

    f32 = jnp.float32
    o_p = jnp.pad(rays_o.astype(f32), ((0, pad), (0, 0)))
    d_p = jnp.concatenate(
        [
            rays_d.astype(f32),
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3)),
        ],
        axis=0,
    )
    z = jnp.pad(z_vals.astype(f32), ((0, pad), (0, 0)), constant_values=1.0)
    norm = jnp.linalg.norm(d_p, axis=-1, keepdims=True)
    delta = (
        jnp.concatenate(
            [z[:, 1:] - z[:, :-1], jnp.full((R + pad, 1), DELTA_INF, f32)],
            axis=1,
        )
        * norm
    )

    inputs = [o_p.T, d_p.T, z.T, delta.T]
    wbs = _prepare_nerf_weights(mlp_params, cfg)
    n_layers = cfg.depth

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _streamed_render_kernel,
        TR=tile_r,
        n_tiles=n_tiles,
        S=S,
        SB=sample_block,
        num_freqs=cfg.num_freqs,
        num_freqs_dir=cfg.num_freqs_dir,
        use_viewdirs=cfg.use_viewdirs,
        n_layers=n_layers,
        skip_at=cfg.skip_at,
        compute_dtype=cfg.compute_dtype,
    )

    pts = (R + pad) * S
    mac = sum(int(np.prod(w.shape)) for w in wbs[::2])
    cost = pl.CostEstimate(
        flops=2 * pts * mac,
        bytes_accessed=(R + pad) * (10 + 2 * S) * 4,
        transcendentals=pts * (6 * cfg.num_freqs + 6),
    )

    TRB = tile_r * sample_block
    enc_dim = 3 + 6 * cfg.num_freqs
    out = pl.pallas_call(
        lambda *a: kernel(*a),
        in_specs=[full() for _ in inputs] + [full() for _ in wbs],
        out_specs=full(),
        out_shape=jax.ShapeDtypeStruct((4, R + pad), f32),
        scratch_shapes=[
            pltpu.VMEM((n_layers, cfg.hidden, TRB), cfg.compute_dtype),
            pltpu.VMEM((enc_dim, TRB), cfg.compute_dtype),
        ],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *wbs)

    out4 = out.T[:R]  # (R, 4)
    comp = out4[:, :3]
    if white_bkgd:
        comp = comp + (1.0 - out4[:, 3:4])
    return comp


def fused_nerf_pass_grads_streamed(
    mlp_params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    target: jax.Array,
    z_vals: jax.Array,
    *,
    sigma_noise: Optional[jax.Array] = None,
    white_bkgd: bool = True,
    cfg: NeRFConfig = NeRFConfig(),
    tile_r: int = DEFAULT_TILE_R,
    sample_block: int = DEFAULT_SAMPLE_BLOCK,
    interpret: Optional[bool] = None,
    peel_last_block: bool = False,
):
    """One streamed fused fwd+bwd NeRF-MLP pass -> (loss, grads).

    peel_last_block: skip the rematerialization of the reverse walk's
    first block (its activations are still in VMEM scratch from the
    forward stream) — value-identical gradients (to the ulp; the peeled
    block compiles as straight-line code), ~1/(4*NB) less matmul work.
    Off by default until validated on real hardware (Mosaic).

    sigma_noise (R, S)|None: pre-ReLU density noise (see
    models/nerf.apply_nerf_mlp); streamed block reads make the noisy
    rematerialized backward bit-consistent with the forward.

    Drop-in for fused_nerf_pass_grads(..., z_vals=..., randomized=False,
    emit_sampling=False) with VMEM scratch O(sample_block) instead of
    O(S): use it for the hierarchical fine pass when the depth union is
    large (S >= ~256 at hidden=128, or any S at hidden=256).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, S = z_vals.shape
    tile_r = min(tile_r, R)
    if R % tile_r:
        raise ValueError(f"n_rand={R} must be a multiple of tile_r={tile_r}")
    sample_block = min(sample_block, S)
    if S % sample_block:
        raise ValueError(
            f"S={S} must be a multiple of sample_block={sample_block}"
        )
    n_tiles = R // tile_r

    f32 = jnp.float32
    z = z_vals.astype(f32)
    norm = jnp.linalg.norm(rays_d.astype(f32), axis=-1, keepdims=True)
    # deltas precomputed in XLA (O(R*S), trivially fused) so blocks need
    # no cross-boundary z adjacency inside the kernel.
    delta = (
        jnp.concatenate(
            [z[:, 1:] - z[:, :-1], jnp.full((R, 1), DELTA_INF, f32)], axis=1
        )
        * norm
    )

    inputs = [
        rays_o.astype(f32).T,
        rays_d.astype(f32).T,
        target.astype(f32).T,
        z.T,  # (S, R)
        delta.T,  # (S, R)
    ]
    if sigma_noise is not None:
        inputs.append(sigma_noise.astype(f32).T)  # (S, R)
    wbs = _prepare_nerf_weights(mlp_params, cfg)
    n_layers = cfg.depth

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [full() for _ in inputs] + [full() for _ in wbs]
    out_shapes = [jax.ShapeDtypeStruct((1, 1), f32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for wset in wbs:
        out_shapes.append(jax.ShapeDtypeStruct(wset.shape, f32))
        out_specs.append(full())

    kernel = functools.partial(
        _streamed_kernel,
        TR=tile_r,
        n_tiles=n_tiles,
        S=S,
        SB=sample_block,
        has_noise=sigma_noise is not None,
        hidden=cfg.hidden,
        num_freqs=cfg.num_freqs,
        num_freqs_dir=cfg.num_freqs_dir,
        use_viewdirs=cfg.use_viewdirs,
        n_layers=n_layers,
        skip_at=cfg.skip_at,
        white_bkgd=white_bkgd,
        inv_n=1.0 / (R * 3),
        compute_dtype=cfg.compute_dtype,
        peel=peel_last_block,
    )

    pts = R * S
    mac = sum(int(np.prod(w.shape)) for w in wbs[::2])
    cost = pl.CostEstimate(
        # fwd + rematerialized fwd + bwd matmuls ~ 4 forward-equivalents
        flops=2 * 4 * pts * mac,
        bytes_accessed=R * (9 + 4 * S) * 4 + 2 * mac * 4,
        transcendentals=2 * pts * (6 * cfg.num_freqs + 6),
    )

    TRB = tile_r * sample_block
    enc_dim = 3 + 6 * cfg.num_freqs
    NB = S // sample_block
    outs = pl.pallas_call(
        lambda *a: kernel(*a),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((n_layers, cfg.hidden, TRB), cfg.compute_dtype),
            pltpu.VMEM((enc_dim, TRB), cfg.compute_dtype),
            pltpu.VMEM((NB, tile_r), f32),  # per-block entry transmittance
        ],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *wbs)

    loss = outs[0][0, 0]
    grads = kernel_grads_to_pytree(outs[1 : 1 + len(wbs)], cfg)
    return loss, grads
