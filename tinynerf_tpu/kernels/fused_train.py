"""Fused Pallas training kernel: forward + backward + MSE-loss gradient
for the TinyNeRF pipeline in ONE kernel invocation per step.

The XLA train step materializes every (n_rand*n_samples, 128)
activation in HBM between the forward and backward passes (~tens of MB
per step for a ~3ms step — bandwidth-bound). This kernel keeps the
whole chain in VMEM: per ray-tile it runs encode -> MLP -> composite ->
MSE residual, then backpropagates to PARAMETER gradients in-register.

Key structural wins:
- rays and jittered z-values are not differentiated (the reference
  doesn't backprop into sampling either), so there is NO sin/cos
  backward and no gradient w.r.t. points — only the parameter path;
- the jitter is drawn by the TPU hardware PRNG in-register — the
  kernel's only HBM inputs are rays, targets, and the (66k-param)
  weights;
- SINGLE grid step with a static in-kernel tile loop: a multi-step
  grid re-issues every weight-block fetch per step and pays per-step
  sequencing overhead (measured ~0.1ms of fixed cost per invocation
  plus refetch costs); here weights load once, gradient accumulators
  live in registers across the unrolled tile loop, and outputs are
  written once;
- both transmittance scans (forward prefix product, backward suffix
  sum = its transpose) run in the DENSE (S, TILE_R) layout — the
  sample-major flat row lane-splits to one ray per column, so each is
  log2(S) SUBLANE rolls on fully-packed registers;
- activations are stored bf16 for the backward matmuls (weight-grad
  dots contract the huge P axis on the MXU); the skip-concat encoding
  gradient is never materialized.

Gradient parity with jax.grad of the unfused loss is asserted in
tests/test_fused_train.py (interpret mode, deterministic depths).
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
from tinynerf_tpu.kernels.scans import (
    prefix_product_exclusive,
    suffix_sum_exclusive,
    sum_over_samples,
)
from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.volume import DELTA_INF, TRANS_EPS

DEFAULT_TILE_R = 128


def _fused_train_kernel(
    seed_ref,  # (1, 1) int32 in SMEM: per-step PRNG seed
    o_ref,  # (3, R) full ray origins (transposed)
    d_ref,  # (3, R) full ray directions
    t_ref,  # (3, R) full target rgb
    *args,  # [noise_ref (S, R)]? + weight/bias refs, then output refs
    TR: int,
    n_tiles: int,
    S: int,
    has_noise: bool,
    num_freqs: int,
    n_layers: int,
    skip_at: int,
    white_bkgd: bool,
    randomized: bool,
    near: float,
    far: float,
    inv_n: float,  # 1 / (n_rand_total * 3): MSE normalization
    compute_dtype,
):
    if has_noise:
        noise_ref, args = args[0], args[1:]
    n_wb = 2 * (n_layers + 1)
    wb = args[:n_wb]
    outs = args[n_wb:]  # loss_ref, then (gw, gb) per layer, head last
    loss_ref = outs[0]
    g_refs = outs[1:]

    P = TR * S
    L = num_freqs
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST
    hidden = wb[2 * (n_layers - 1)][:].shape[0] if n_layers else 0

    s_row = _iota2((1, P), 1) // TR  # sample slot (sample-major)
    h_bin = (far - near) / (S - 1)
    grid_z = near + h_bin * s_row.astype(f32)  # (1, P)
    r_ids = _iota2((3 * L, 3), 0)
    c_ids = _iota2((3 * L, 3), 1)
    B = jnp.where(r_ids % 3 == c_ids, jnp.exp2((r_ids // 3).astype(f32)), 0.0)

    def dense(h_c, i):
        return (
            jnp.dot(
                wb[2 * i][:].astype(compute_dtype), h_c,
                preferred_element_type=f32,
            )
            + wb[2 * i + 1][:]
        )

    def tile_grads(ti):
        """One ray tile: forward + backward; returns (loss, [gw/gb...]).

        ti may be a traced loop index: slices use pl.ds with a
        multiple-of hint so Mosaic keeps aligned layouts.
        """
        start = pl.multiple_of(ti * TR, TR) if not isinstance(ti, int) else ti * TR
        sl = pl.ds(start, TR)
        o_t, d_t, tgt = o_ref[:, sl], d_ref[:, sl], t_ref[:, sl]

        # Stratified depths in-register; jitter via the TPU PRNG in the
        # reference's bins (src/sampling.py:20-25).
        if randomized:
            # Fold (seed, tile) into the hardware PRNG so tile streams
            # are decorrelated (seed+ti would alias adjacent steps'
            # streams shifted by one tile).
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

        # ---------------- forward ----------------
        od = pltpu.repeat(jnp.concatenate([o_t, d_t], axis=0), S, axis=1)
        pts = od[0:3] + od[3:6] * z_row  # (3, P)
        theta = jnp.dot(B, pts, preferred_element_type=f32, precision=HI)
        enc_c = jnp.concatenate(
            [pts, jnp.sin(theta), jnp.cos(theta)], axis=0
        ).astype(compute_dtype)  # (E, P)

        acts = [enc_c]  # acts[i] = post-activation output of layer i-1
        for i in range(n_layers):
            h_in = acts[i] if i != skip_at else jnp.concatenate(
                [acts[i], enc_c], axis=0
            )
            acts.append(jnp.maximum(dense(h_in, i), 0.0).astype(compute_dtype))
        head_in = (
            acts[n_layers]
            if n_layers != skip_at
            else jnp.concatenate([acts[n_layers], enc_c], axis=0)
        )
        head = dense(head_in, n_layers)  # (4, P)
        rgb = jax.nn.sigmoid(head[0:3])
        sigma_raw = head[3:4]
        if has_noise:
            # Pre-ReLU density noise (same (S, TR) lane-merge as z).
            sigma_raw = sigma_raw + noise_ref[:, sl].reshape(1, P)
        sigma = jnp.maximum(sigma_raw, 0.0)

        one_m = jnp.exp(-sigma * delta) + TRANS_EPS  # (1, P)
        alpha = 1.0 - (one_m - TRANS_EPS)

        trans = prefix_product_exclusive(one_m, S, TR)
        w = alpha * trans  # (1, P)
        A4 = sum_over_samples(jnp.concatenate([rgb * w, w], axis=0), S, TR)
        comp = A4[0:3]  # (3, TR)
        acc = A4[3:4]  # (1, TR)
        if white_bkgd:
            comp = comp + (1.0 - acc)
        resid = comp - tgt  # (3, TR)
        loss = jnp.sum(resid * resid) * inv_n

        # ---------------- backward ----------------
        g_comp = (2.0 * inv_n) * resid  # (3, TR)
        g3 = pltpu.repeat(g_comp, S, axis=1)  # (3, P)
        g_rgb = g3 * w
        g_w = jnp.sum(g3 * rgb, axis=0, keepdims=True)  # (1, P)
        if white_bkgd:
            g_acc = -jnp.sum(g_comp, axis=0, keepdims=True)  # (1, TR)
            g_w = g_w + pltpu.repeat(g_acc, S, axis=1)

        g_alpha = g_w * trans
        g_trans = g_w * alpha
        suf = suffix_sum_exclusive(g_trans * trans, S, TR)
        g_one_m = suf / one_m - g_alpha
        g_sigma = g_one_m * (-(delta) * (one_m - TRANS_EPS))

        g_head = jnp.concatenate(
            [g_rgb * rgb * (1.0 - rgb), g_sigma * (sigma > 0)], axis=0
        )  # (4, P)

        def dense_in(i):
            return acts[i] if i != skip_at else jnp.concatenate(
                [acts[i], enc_c], axis=0
            )

        grads = [None] * (2 * (n_layers + 1))

        def dense_bwd(g_c, i):
            """Record gw/gb for layer i; return upstream grad in
            compute dtype. The skip layer's concat'd encoding gradient
            is never materialized (weight sliced to `hidden` rows)."""
            grads[2 * i] = jax.lax.dot_general(
                g_c, dense_in(i), dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
            grads[2 * i + 1] = jnp.sum(g_c.astype(f32), axis=1, keepdims=True)
            wmat = wb[2 * i][:]
            w_up = wmat if i != skip_at else wmat[:, :hidden]
            return jax.lax.dot_general(
                w_up.astype(compute_dtype), g_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).astype(compute_dtype)

        g = dense_bwd(g_head.astype(compute_dtype), n_layers)
        for i in reversed(range(n_layers)):
            # relu mask from the stored post-activation (f32 compare:
            # Mosaic lacks bf16 vector comparisons)
            g = g * (acts[i + 1].astype(f32) > 0).astype(compute_dtype)
            g = dense_bwd(g, i)
        return loss, grads

    # Tile loop with register/VMEM-resident accumulators: weights are
    # fetched once, outputs written once. Small tile counts unroll
    # (lets the scheduler interleave); large ones use lax.fori_loop —
    # unrolling 32+ tile bodies blows Mosaic compile time up by
    # minutes while running no faster.
    if n_tiles <= 16:
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


def fused_loss_grads(
    params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    target: jax.Array,
    seed,
    *,
    sigma_noise: Optional[jax.Array] = None,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    randomized: bool = True,
    num_freqs: int = 10,
    white_bkgd: bool = True,
    model_cfg: TinyNeRFConfig = TinyNeRFConfig(),
    tile_r: int = DEFAULT_TILE_R,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, dict]:
    """One fused kernel -> (mse_loss, grads-in-model-layout).

    Semantics match jax.grad of the unfused training loss
    (training.loss_fn): MSE over (R, 3) of the white-background
    composite vs target, with stratified-jittered depths. The jitter is
    drawn by the TPU hardware PRNG from `seed` (an int32 scalar) — the
    same bins as the reference (src/sampling.py:20-25), a different
    stream than jax.random. rays/z are constants w.r.t. the gradient
    (as in the reference). With randomized=False the depths are the
    deterministic linspace and results match jax.grad exactly.
    """
    from tinynerf_tpu.kernels.fused_render import _prepare_weights

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = rays_o.shape[0]
    S = n_samples
    # Under data-parallel sharding the local batch may be smaller than
    # the default tile; shrink to fit (compiled TPU kernels still need
    # a 128-multiple lane dim — i.e. n_rand/n_devices >= 128 on HW).
    tile_r = min(tile_r, R)
    if R % tile_r:
        raise ValueError(f"n_rand={R} must be a multiple of tile_r={tile_r}")
    n_tiles = R // tile_r

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    o_t = rays_o.astype(jnp.float32).T
    d_t = rays_d.astype(jnp.float32).T
    t_t = target.astype(jnp.float32).T

    wbs = _prepare_weights(params, num_freqs, model_cfg.skip_at)
    n_layers = model_cfg.depth

    kernel = functools.partial(
        _fused_train_kernel,
        TR=tile_r,
        n_tiles=n_tiles,
        S=S,
        has_noise=sigma_noise is not None,
        num_freqs=num_freqs,
        n_layers=n_layers,
        skip_at=model_cfg.skip_at,
        white_bkgd=white_bkgd,
        randomized=randomized,
        near=float(near),
        far=float(far),
        inv_n=1.0 / (R * 3),
        compute_dtype=model_cfg.compute_dtype,
    )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]  # loss
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for wset in wbs:
        out_shapes.append(jax.ShapeDtypeStruct(wset.shape, jnp.float32))
        out_specs.append(full())

    pts = R * S
    mac = sum(int(np.prod(w.shape)) for w in wbs[::2])
    cost = pl.CostEstimate(
        flops=2 * 3 * pts * mac,  # fwd + 2x bwd
        bytes_accessed=R * 9 * 4 + 2 * mac * 4,
        transcendentals=pts * (6 * num_freqs + 6),
    )

    extra = [] if sigma_noise is None else [sigma_noise.astype(jnp.float32).T]
    outs = pl.pallas_call(
        lambda sd, o, d, t, *rest: kernel(sd, o, d, t, *rest),
        in_specs=[seed_spec, full(), full(), full()]
        + [full() for _ in extra]
        + [full() for _ in wbs],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=cost,
        # fwd+bwd activations for an 8192-point tile exceed the 16MB
        # default scoped-vmem budget; v5e has far more physical VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, o_t, d_t, t_t, *extra, *wbs)

    loss = outs[0][0, 0]
    g_kernel = outs[1:]

    # Map kernel-layout grads back to the model pytree.
    perm = _encode_permutation(num_freqs)
    inv = np.argsort(perm)
    hidden = model_cfg.hidden
    layers = []
    for i in range(n_layers):
        gw = g_kernel[2 * i].T  # (in, out) model orientation
        if i == 0:
            gw = jnp.take(gw, inv, axis=0)
        elif i == model_cfg.skip_at:
            gw = jnp.concatenate(
                [gw[:hidden], jnp.take(gw[hidden:], inv, axis=0)], axis=0
            )
        layers.append({"w": gw, "b": g_kernel[2 * i + 1][:, 0]})
    gwh = g_kernel[2 * n_layers].T  # (hidden, 4)
    gbh = g_kernel[2 * n_layers + 1][:, 0]  # (4,)
    grads = {
        "layers": layers,
        "rgb": {"w": gwh[:, 0:3], "b": gbh[0:3]},
        "sigma": {"w": gwh[:, 3:4], "b": gbh[3:4]},
    }
    return loss, grads


def make_fused_grad_fn(
    s,
    tile_r: int = DEFAULT_TILE_R,
    randomized: Optional[bool] = None,
    interpret: Optional[bool] = None,
):
    """(params, ro, rd, target, key) -> (grads, metrics) via the fused
    kernel — drop-in for jax.grad of training.loss_fn. The jax key is
    distilled to an int32 seed for the in-kernel TPU PRNG (same
    stratified bins as the reference; different stream than
    jax.random — documented behavioral delta of the fused train path).
    """
    from tinynerf_tpu.utils.metrics import mse2psnr

    if randomized is None:
        # The hardware PRNG primitives have no CPU/interpret lowering;
        # on CPU (tests, simulated meshes) fall back to deterministic
        # stratified depths. Real-TPU training keeps the jitter.
        randomized = jax.default_backend() == "tpu"

    noise_std = getattr(s, "sigma_noise_std", 0.0)

    def grad_fn(params, ro, rd, target, key, noise_scale=1.0):
        noise = None
        if noise_std > 0.0:
            # Split ONLY when noise is on: noise-off seed stream stays
            # bit-identical to the historical recipe.
            key, k_noise = jax.random.split(key)
            noise = noise_scale * noise_std * jax.random.normal(
                k_noise, (ro.shape[0], s.n_samples), jnp.float32
            )
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        loss, grads = fused_loss_grads(
            params,
            ro,
            rd,
            target,
            seed,
            sigma_noise=noise,
            n_samples=s.n_samples,
            near=s.near,
            far=s.far,
            randomized=randomized,
            num_freqs=s.num_freqs,
            white_bkgd=s.white_bkgd,
            model_cfg=s.model_cfg,
            tile_r=tile_r,
            interpret=interpret,
        )
        return grads, {"loss": loss, "psnr": mse2psnr(loss)}

    return grad_fn
