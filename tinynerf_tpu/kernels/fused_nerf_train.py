"""Fused Pallas training kernels for the full hierarchical NeRF.

The hierarchical objective (models/nerf.make_hierarchical_loss) is
mse(coarse) + mse(fine) with stop_gradient on the resampling weights —
so the two passes' backwards are INDEPENDENT given their depths. Each
pass therefore gets one fused fwd+bwd kernel (encode -> trunk ->
sigma head -> viewdir branch -> rgb head -> composite -> MSE residual
-> parameter gradients, all in VMEM), and the only XLA between them is
the tiny inverse-CDF resample + sort on (R, S) arrays:

  coarse kernel (jittered z in-register via the TPU PRNG;
                 emits loss_c, grads_c, weights, and the z it used)
    -> sample_pdf + sorted union (ops/sampling.py)
    -> fine kernel (z input; emits loss_f, grads_f)

Structure matches kernels/fused_train.py (the TinyNeRF kernel): ONE
grid step with a static in-kernel tile loop, so the ~150k params load
into VMEM once, gradient accumulators live in registers across tiles,
and outputs are written once — vs the earlier grid=(n_tiles,) design
that refetched every weight block and read-modify-wrote every gradient
accumulator through HBM per tile (~16% MFU; this design measures ~3x
that at the canonical 2048x(64+128) recipe).

Backward structure beyond kernels/fused_train.py: the trunk output
feeds BOTH heads, so its gradient is the sum of the sigma-head and
rgb-branch contributions; the rgb branch's concat'd direction encoding
receives no gradient (directions aren't differentiated) — the upstream
dot uses the weight sliced to its first `hidden` input rows, and the
direction-encoding rows still contribute to the WEIGHT gradient via the
rebuilt concat input.

Gradient parity with jax.grad of the unfused hierarchical loss is
asserted on the deterministic-depth path (tests/test_fused_nerf_train.py).
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
from tinynerf_tpu.kernels.fused_render import _encode_permutation, _iota2
from tinynerf_tpu.kernels.scans import (
    prefix_product_exclusive,
    suffix_sum_exclusive,
    sum_over_samples,
)
from tinynerf_tpu.models.nerf import NeRFConfig
from tinynerf_tpu.ops.volume import DELTA_INF, TRANS_EPS

DEFAULT_TILE_R = 128

# The NeRF tile body is ~3x the TinyNeRF one (8-deep trunk + two heads,
# fwd+bwd); unrolling many of them blows Mosaic compile time (CLAUDE.md
# gotcha: 30+ TinyNeRF bodies hang for minutes). Unroll only a few and
# use lax.fori_loop beyond.
_UNROLL_TILES = 4


def _nerf_train_kernel(
    seed_ref,  # (1,1) int32 SMEM
    o_ref,  # (3, R) full ray origins (transposed)
    d_ref,  # (3, R) full ray directions
    t_ref,  # (3, R) full target rgb
    *args,  # [z_ref (S, R)]? + [noise_ref (S, R)]? + weight refs + output refs + scratch refs
    TR: int,
    n_tiles: int,
    S: int,
    has_z: bool,
    has_noise: bool,
    emit_sampling: bool,  # also output (weights, z) for resampling
    randomized: bool,
    num_freqs: int,
    num_freqs_dir: int,
    use_viewdirs: bool,
    n_layers: int,
    skip_at: int,
    near: float,
    far: float,
    white_bkgd: bool,
    inv_n: float,
    compute_dtype,
):
    # Trailing two args are VMEM scratch (activation store); the
    # activations CANNOT live as SSA values — ~55MB of live vregs makes
    # the Mosaic register allocator create >200MB of spill slots.
    acts_scr, enc_scr = args[-2], args[-1]
    args = args[:-2]
    if has_z:
        z_ref, args = args[0], args[1:]
    if has_noise:
        noise_ref, args = args[0], args[1:]
    n_wb = 2 * (n_layers + 3)  # trunk + sigma + rgb_in + rgb
    wb = args[:n_wb]
    outs = args[n_wb:]
    loss_ref = outs[0]
    g_refs = outs[1 : 1 + n_wb]
    if emit_sampling:
        w_out_ref, z_out_ref = outs[1 + n_wb], outs[2 + n_wb]

    P = TR * S
    L = num_freqs
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST
    s_row = _iota2((1, P), 1) // TR
    h_bin = (far - near) / (S - 1)
    grid_z = near + h_bin * s_row.astype(f32)

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

    def tile_grads(ti):
        """One ray tile: forward + backward; returns (loss, [gw/gb...]).

        ti may be a traced fori_loop index: slices use pl.ds with a
        multiple-of hint so Mosaic keeps aligned layouts.
        """
        start = pl.multiple_of(ti * TR, TR) if not isinstance(ti, int) else ti * TR
        sl = pl.ds(start, TR)
        o_t, d_t, tgt = o_ref[:, sl], d_ref[:, sl], t_ref[:, sl]

        # ---- depths ----
        if has_z:
            # (S, TR) row-major == sample-major flat order: lane-merge.
            z_row = z_ref[:, sl].reshape(1, P)
        elif randomized:
            # Per-tile stream decorrelated from the per-step seed by
            # letting the hardware PRNG fold both (not seed+ti, which
            # aliases streams across adjacent steps).
            pltpu.prng_seed(seed_ref[0, 0], ti)
            # Mosaic can't cast uint32->f32; keep 24 bits non-negative
            # in int32 (same [0, 1) uniform).
            bits = pltpu.bitcast(pltpu.prng_random_bits((1, P)), jnp.int32)
            u = (bits & 0xFFFFFF).astype(f32) * (1.0 / (1 << 24))
            lower = jnp.where(s_row == 0, grid_z, grid_z - 0.5 * h_bin)
            upper = jnp.where(s_row == S - 1, grid_z, grid_z + 0.5 * h_bin)
            z_row = lower + (upper - lower) * u
        else:
            z_row = grid_z

        norm = jnp.sqrt(jnp.sum(d_t * d_t, axis=0, keepdims=True))  # (1, TR)
        norm_rep = pltpu.repeat(norm, S, axis=1)
        z_next = pltpu.roll(z_row, shift=P - TR, axis=1)
        delta = jnp.where(s_row == S - 1, DELTA_INF, z_next - z_row) * norm_rep

        # ---- forward (post-activations staged in VMEM scratch) ----
        od = pltpu.repeat(jnp.concatenate([o_t, d_t], axis=0), S, axis=1)
        pts = od[0:3] + od[3:6] * z_row  # (3, P)
        enc_scr[:] = fourier(pts, L).astype(compute_dtype)  # (E, P)

        def act(i):
            """acts[i]: the input of trunk layer i (enc for i=0)."""
            return enc_scr[:] if i == 0 else acts_scr[i - 1]

        h = enc_scr[:]
        for i in range(n_layers):
            h_in = h if i != skip_at else jnp.concatenate(
                [h, enc_scr[:]], axis=0
            )
            h = jnp.maximum(dense(h_in, i), 0.0).astype(compute_dtype)
            acts_scr[i] = h
        h_trunk = h  # (hidden, P)
        hidden = h_trunk.shape[0]

        sigma_raw = dense(h_trunk, I_SIG)  # (1, P)
        if has_noise:
            # Pre-ReLU density noise (same (S, TR) lane-merge as z).
            sigma_raw = sigma_raw + noise_ref[:, sl].reshape(1, P)
        sigma = jnp.maximum(sigma_raw, 0.0)  # (1, P)

        if use_viewdirs:
            vdir = d_t / norm
            enc_d_rep = pltpu.repeat(
                fourier(vdir, num_freqs_dir), S, axis=1
            ).astype(compute_dtype)  # (Dd, P)
            rgb_in_input = jnp.concatenate([h_trunk, enc_d_rep], axis=0)
        else:
            rgb_in_input = h_trunk
        g1 = jnp.maximum(dense(rgb_in_input, I_IN), 0.0).astype(compute_dtype)
        rgb = jax.nn.sigmoid(dense(g1, I_RGB))  # (3, P)

        # ---- composite ----
        one_m = jnp.exp(-sigma * delta) + TRANS_EPS
        alpha = 1.0 - (one_m - TRANS_EPS)
        trans = prefix_product_exclusive(one_m, S, TR)
        w = alpha * trans
        A = sum_over_samples(jnp.concatenate([rgb * w, w], axis=0), S, TR)
        comp = A[0:3]
        acc = A[3:4]
        if white_bkgd:
            comp = comp + (1.0 - acc)
        resid = comp - tgt
        loss = jnp.sum(resid * resid) * inv_n

        if emit_sampling:
            w_out_ref[:, sl] = w.reshape(S, TR)
            z_out_ref[:, sl] = z_row.reshape(S, TR)

        # ---- backward ----
        g_comp = (2.0 * inv_n) * resid
        g3 = pltpu.repeat(g_comp, S, axis=1)
        g_rgb = g3 * w
        g_w = jnp.sum(g3 * rgb, axis=0, keepdims=True)
        if white_bkgd:
            g_w = g_w + pltpu.repeat(
                -jnp.sum(g_comp, axis=0, keepdims=True), S, axis=1
            )
        g_alpha = g_w * trans
        g_trans = g_w * alpha
        suf = suffix_sum_exclusive(g_trans * trans, S, TR)
        g_one_m = suf / one_m - g_alpha
        g_sigma = g_one_m * (-(delta) * (one_m - TRANS_EPS))

        grads = [None] * n_wb

        def dense_bwd(g_c, i, h_in_c, keep_in=None):
            """Record gw/gb for layer i; return upstream grad in
            compute dtype. keep_in slices the weight so a concat'd
            constant input's gradient is never materialized."""
            grads[2 * i] = jax.lax.dot_general(
                g_c, h_in_c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
            grads[2 * i + 1] = jnp.sum(g_c.astype(f32), axis=1, keepdims=True)
            w_full = wb[2 * i][:]
            w_up = w_full if keep_in is None else w_full[:, :keep_in]
            return jax.lax.dot_general(
                w_up.astype(compute_dtype), g_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).astype(compute_dtype)

        # rgb head -> rgb_in branch.
        g_rgbpre = (g_rgb * rgb * (1.0 - rgb)).astype(compute_dtype)  # (3, P)
        g_g1 = dense_bwd(g_rgbpre, I_RGB, g1)  # (rgb_hidden, P)
        g_a1 = g_g1 * (g1.astype(f32) > 0).astype(compute_dtype)
        g_h_rgb = dense_bwd(g_a1, I_IN, rgb_in_input, keep_in=hidden)

        # sigma head (gradient masked by its ReLU).
        g_sigpre = (g_sigma * (sigma > 0)).astype(compute_dtype)  # (1, P)
        g_h_sig = dense_bwd(g_sigpre, I_SIG, act(n_layers))  # (hidden, P)

        # trunk: output feeds both heads.
        g = g_h_rgb + g_h_sig
        for i in reversed(range(n_layers)):
            # relu mask from the stored post-activation (f32 compare:
            # Mosaic lacks bf16 vector comparisons)
            g = g * (act(i + 1).astype(f32) > 0).astype(compute_dtype)
            h_in = act(i) if i != skip_at else jnp.concatenate(
                [act(i), enc_scr[:]], axis=0
            )
            g = dense_bwd(g, i, h_in, keep_in=hidden if i == skip_at else None)
        return loss, grads

    # Tile loop with register/VMEM-resident accumulators: weights are
    # fetched once, outputs written once (see module docstring).
    if n_tiles <= _UNROLL_TILES:
        total_loss = None
        total_grads = None
        for ti in range(n_tiles):
            loss, grads = tile_grads(ti)
            if total_loss is None:
                total_loss, total_grads = loss, grads
            else:
                total_loss = total_loss + loss
                total_grads = [a + b for a, b in zip(total_grads, grads)]
    else:
        loss0, grads0 = tile_grads(0)

        def body(ti, carry):
            tot_l, tot_g = carry
            loss, grads = tile_grads(ti)
            return tot_l + loss, [a + b for a, b in zip(tot_g, grads)]

        total_loss, total_grads = jax.lax.fori_loop(
            1, n_tiles, body, (loss0, list(grads0))
        )

    loss_ref[0, 0] = total_loss
    for ref, g in zip(g_refs, total_grads):
        ref[:] = g


def kernel_grads_to_pytree(g_kernel, cfg: NeRFConfig):
    """Map kernel-layout gradient arrays back to the model pytree
    (inverse of _prepare_nerf_weights: transpose + inverse row
    permutations). Shared by the monolithic and streamed kernels."""
    n_layers = cfg.depth
    perm = _encode_permutation(cfg.num_freqs)
    inv = np.argsort(perm)
    hidden = cfg.hidden
    layers = []
    for i in range(n_layers):
        gw = g_kernel[2 * i].T
        if i == 0:
            gw = jnp.take(gw, inv, axis=0)
        elif i == cfg.skip_at:
            gw = jnp.concatenate(
                [gw[:hidden], jnp.take(gw[hidden:], inv, axis=0)], axis=0
            )
        layers.append({"w": gw, "b": g_kernel[2 * i + 1][:, 0]})
    gs = {
        "layers": layers,
        "sigma": {
            "w": g_kernel[2 * n_layers].T,
            "b": g_kernel[2 * n_layers + 1][:, 0],
        },
    }
    gw_in = g_kernel[2 * n_layers + 2].T  # (hidden+Dd, rgb_hidden)
    if cfg.use_viewdirs:
        inv_d = np.argsort(_encode_permutation(cfg.num_freqs_dir))
        gw_in = jnp.concatenate(
            [gw_in[:hidden], jnp.take(gw_in[hidden:], inv_d, axis=0)], axis=0
        )
    gs["rgb_in"] = {"w": gw_in, "b": g_kernel[2 * n_layers + 3][:, 0]}
    gs["rgb"] = {
        "w": g_kernel[2 * n_layers + 4].T,
        "b": g_kernel[2 * n_layers + 5][:, 0],
    }
    return gs


def fused_nerf_pass_grads(
    mlp_params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    target: jax.Array,
    seed,
    z_vals: Optional[jax.Array] = None,
    *,
    sigma_noise: Optional[jax.Array] = None,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    randomized: bool = True,
    white_bkgd: bool = True,
    emit_sampling: bool = False,
    cfg: NeRFConfig = NeRFConfig(),
    tile_r: int = DEFAULT_TILE_R,
    interpret: Optional[bool] = None,
):
    """One fused fwd+bwd NeRF-MLP pass -> (loss, grads[, weights, z])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = rays_o.shape[0]
    S = z_vals.shape[1] if z_vals is not None else n_samples
    tile_r = min(tile_r, R)
    if R % tile_r:
        raise ValueError(f"n_rand={R} must be a multiple of tile_r={tile_r}")
    n_tiles = R // tile_r

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    o_t = rays_o.astype(jnp.float32).T
    d_t = rays_d.astype(jnp.float32).T
    t_t = target.astype(jnp.float32).T
    inputs = [seed_arr, o_t, d_t, t_t]

    wbs = _prepare_nerf_weights(mlp_params, cfg)
    n_layers = cfg.depth

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = [seed_spec, full(), full(), full()]
    if z_vals is not None:
        inputs.append(z_vals.astype(jnp.float32).T)  # (S, R)
        in_specs.append(full())
    if sigma_noise is not None:
        inputs.append(sigma_noise.astype(jnp.float32).T)  # (S, R)
        in_specs.append(full())
    in_specs += [full() for _ in wbs]

    out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for wset in wbs:
        out_shapes.append(jax.ShapeDtypeStruct(wset.shape, jnp.float32))
        out_specs.append(full())
    if emit_sampling:
        out_shapes.append(jax.ShapeDtypeStruct((S, R), jnp.float32))  # weights
        out_specs.append(full())
        out_shapes.append(jax.ShapeDtypeStruct((S, R), jnp.float32))  # z
        out_specs.append(full())

    kernel = functools.partial(
        _nerf_train_kernel,
        TR=tile_r,
        n_tiles=n_tiles,
        S=S,
        has_z=z_vals is not None,
        has_noise=sigma_noise is not None,
        emit_sampling=emit_sampling,
        randomized=randomized,
        num_freqs=cfg.num_freqs,
        num_freqs_dir=cfg.num_freqs_dir,
        use_viewdirs=cfg.use_viewdirs,
        n_layers=n_layers,
        skip_at=cfg.skip_at,
        near=float(near),
        far=float(far),
        white_bkgd=white_bkgd,
        inv_n=1.0 / (R * 3),
        compute_dtype=cfg.compute_dtype,
    )

    pts = R * S
    mac = sum(int(np.prod(w.shape)) for w in wbs[::2])
    cost = pl.CostEstimate(
        flops=2 * 3 * pts * mac,
        bytes_accessed=R * (9 + (S if z_vals is not None else 0)) * 4 + 2 * mac * 4,
        transcendentals=pts * (6 * cfg.num_freqs + 6),
    )

    P = tile_r * S
    enc_dim = 3 + 6 * cfg.num_freqs
    outs = pl.pallas_call(
        lambda *a: kernel(*a),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # Activation store: the fine pass at 2048x192 keeps ~55MB of
        # bf16 activations per 128-ray tile live through the backward;
        # v5e has 128MB of physical VMEM and the 16MB scoped default is
        # a compiler knob. These must be scratch, not SSA values — see
        # the register-spill note in the kernel.
        scratch_shapes=[
            pltpu.VMEM((n_layers, cfg.hidden, P), cfg.compute_dtype),
            pltpu.VMEM((enc_dim, P), cfg.compute_dtype),
        ],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *wbs)

    loss = outs[0][0, 0]
    g_kernel = outs[1 : 1 + len(wbs)]
    gs = kernel_grads_to_pytree(g_kernel, cfg)

    if emit_sampling:
        return loss, gs, outs[-2].T, outs[-1].T  # weights (R,S), z (R,S)
    return loss, gs


def make_fused_nerf_grad_fn(
    s,
    cfg: NeRFConfig,
    n_fine: int = 64,
    tile_r: int = DEFAULT_TILE_R,
    randomized: Optional[bool] = None,
    interpret: Optional[bool] = None,
    sample_block: Optional[int] = None,
    peel_last_block: bool = False,
):
    """Hierarchical (coarse+fine) fused gradient fn, drop-in for
    jax.grad of models/nerf.make_hierarchical_loss.

    (params{'coarse','fine'}, ro, rd, target, key) -> (grads, metrics).

    The fine pass streams sample blocks through VMEM (O(block) scratch,
    kernels/fused_nerf_stream.py) when the depth union would not fit the
    monolithic kernel — automatically when union * hidden activations
    exceed ~60MB, or always when `sample_block` is given explicitly.
    """
    from tinynerf_tpu.ops.sampling import sample_pdf
    from tinynerf_tpu.utils.metrics import mse2psnr

    if randomized is None:
        randomized = jax.default_backend() == "tpu"

    s_union = s.n_samples + n_fine
    # Monolithic fine-pass activation scratch (see fused_nerf_pass_grads
    # scratch_shapes): n_layers x hidden x (tile_r * S) in compute dtype.
    act_bytes = (
        cfg.depth * cfg.hidden * min(tile_r, s.n_rand) * s_union
        * (2 if cfg.compute_dtype == jnp.bfloat16 else 4)
    )
    stream_fine = sample_block is not None or act_bytes > 60 * 1024 * 1024
    if stream_fine:
        from tinynerf_tpu.kernels.fused_nerf_stream import (
            DEFAULT_SAMPLE_BLOCK,
            fused_nerf_pass_grads_streamed,
        )

        if sample_block is not None:
            fine_block = min(sample_block, s_union)
            if s_union % fine_block:
                raise ValueError(
                    f"fine union {s_union} must be a multiple of "
                    f"sample_block {fine_block}"
                )
        else:
            # Auto: largest sublane-aligned divisor of the union within
            # the default block budget (e.g. union 192 -> 96).
            fine_block = next(
                b
                for b in range(min(DEFAULT_SAMPLE_BLOCK, s_union), 0, -1)
                if s_union % b == 0 and (b % 8 == 0 or b == s_union)
            )

    noise_std = getattr(s, "sigma_noise_std", 0.0)

    def grad_fn(params, ro, rd, target, key, noise_scale=1.0):
        noise_c = noise_f = None
        if noise_std > 0.0:
            # Extra splits ONLY when noise is on (noise-off streams stay
            # bit-identical); the (R, S) draws are XLA-side so fused and
            # unfused paths share the same noise mechanism and the
            # streamed kernel's two passes read one consistent buffer.
            key, k_nc, k_nf = jax.random.split(key, 3)
            R = ro.shape[0]
            noise_c = noise_scale * noise_std * jax.random.normal(
                k_nc, (R, s.n_samples), jnp.float32
            )
            noise_f = noise_scale * noise_std * jax.random.normal(
                k_nf, (R, s_union), jnp.float32
            )
        k_seed, k_pdf = jax.random.split(key)
        seed = jax.random.randint(k_seed, (), 0, 2**31 - 1, dtype=jnp.int32)
        loss_c, g_c, weights, z_c = fused_nerf_pass_grads(
            params["coarse"], ro, rd, target, seed,
            n_samples=s.n_samples, near=s.near, far=s.far,
            randomized=randomized, white_bkgd=s.white_bkgd,
            emit_sampling=True, cfg=cfg, tile_r=tile_r, interpret=interpret,
            sigma_noise=noise_c,
        )
        z_mids = 0.5 * (z_c[:, 1:] + z_c[:, :-1])
        z_f = sample_pdf(
            z_mids, jax.lax.stop_gradient(weights[:, 1:-1]), n_fine,
            randomized=randomized, key=k_pdf if randomized else None,
        )
        z_union = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
        if stream_fine:
            loss_f, g_f = fused_nerf_pass_grads_streamed(
                params["fine"], ro, rd, target, z_union,
                white_bkgd=s.white_bkgd, cfg=cfg, tile_r=tile_r,
                sample_block=fine_block, interpret=interpret,
                sigma_noise=noise_f, peel_last_block=peel_last_block,
            )
        else:
            loss_f, g_f = fused_nerf_pass_grads(
                params["fine"], ro, rd, target, seed, z_union,
                near=s.near, far=s.far, randomized=False,
                white_bkgd=s.white_bkgd, cfg=cfg, tile_r=tile_r, interpret=interpret,
                sigma_noise=noise_f,
            )
        grads = {"coarse": g_c, "fine": g_f}
        return grads, {
            "loss": loss_f,
            "psnr": mse2psnr(loss_f),
            "loss_coarse": loss_c,
        }

    return grad_fn
