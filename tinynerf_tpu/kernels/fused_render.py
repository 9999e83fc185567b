"""Fused Pallas TPU kernel: rays -> sample points -> Fourier encoding ->
TinyNeRF MLP -> alpha-composite, all inside VMEM.

This is the framework's speed-of-light path for rendering (the
reference's hot chain, src/train.py:117-121, executed per 8192-ray
chunk): a tile of rays enters the kernel as (origins, directions) and
leaves as composited RGBA — the (TILE_R * n_samples) sample points,
their 63-dim encodings, and all MLP activations live and die in VMEM
without ever touching HBM. Depth values and deltas are derived
analytically in-register (deterministic stratified spacing, ref
src/sampling.py:16-18 with randomized=False).

Layout: FEATURE-MAJOR (transposed). Sample points live on the LANE
axis (ray-major order p = r*S + s) and features/channels on sublanes:
activations are (features, P) matrices, so sin/cos/exp/sigmoid over
3-to-63-row arrays use every lane instead of padding 3-to-7-wide
row vectors to 128 lanes (a 4-16x VPU saving vs the naive layout),
and the MLP is W^T(out,in) @ X(in,P) on the MXU with a huge N.

Mosaic discipline — 2-D, reshape-free, matmul-free outside the MLP:
- points are SAMPLE-MAJOR on lanes (p = s*TILE_R + r), so per-ray ->
  per-point expansion is an exact lane tile (pltpu.repeat) and the
  final per-ray reduction is a lane-halving adder tree;
- the transmittance prefix-product is a segmented Hillis-Steele scan
  along lanes (log2(S) rounds of pltpu.roll + masked multiply), exact
  f32, no layout conversion, no sequential per-sample loop;
- f32 matmuls carry Precision.HIGHEST (the TPU default is ONE bf16
  pass — catastrophic for positions that feed sin(2^(L-1) x) and for
  composite values); the big MLP matmuls are *intentionally* bf16 with
  f32 accumulation.

Weight layout: the wrapper transposes weights and permutes the
first-layer / skip rows so the kernel's (k-major) sin/cos feature
order matches the reference's interleaved order (src/encoding.py:30-32)
— outputs are numerically the model's, only the layout changes.

Known numeric edge (shared with every implementation of the rendering
equation, including the reference): rays whose LAST sample's density
sits within f32 noise of the ReLU boundary flip alpha_last between 0
and 1 through the 1e10 terminal delta (src/volume.py:20). Parity holds
everywhere else; trained models don't sit on the boundary.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.volume import DELTA_INF, TRANS_EPS

# Compiled TPU blocks need lane dims divisible by 128; 128 also
# benchmarks fastest (1.75x over the unfused XLA path at 8192 rays).
DEFAULT_TILE_R = 128


def _encode_permutation(num_freqs: int) -> np.ndarray:
    """perm[j] = model-feature index of kernel-encoding row j.

    Kernel layout: [x, y, z, sin(k-major), cos(k-major)]; model layout
    (ref src/encoding.py:30-32): [x, y, z, sin f0 (xyz), cos f0 (xyz),
    sin f1 (xyz), ...].
    """
    L = num_freqs
    perm = list(range(3))
    for k in range(L):
        perm.extend(3 + 6 * k + c for c in range(3))
    for k in range(L):
        perm.extend(3 + 6 * k + 3 + c for c in range(3))
    return np.asarray(perm, dtype=np.int32)


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _fused_kernel(
    o_ref,  # (3, R) ray origins (transposed), all tiles
    d_ref,  # (3, R) ray directions
    *wb_refs,  # transposed weights (out, in) and biases (out, 1)
    out_ref,  # (4, R): comp_r, comp_g, comp_b, acc
    TR: int,
    n_tiles: int,
    S: int,
    num_freqs: int,
    n_layers: int,
    skip_at: int,
    near: float,
    far: float,
    compute_dtype,
):
    """SINGLE grid step with an in-kernel tile loop (same structure as
    fused_train): a multi-step grid re-issues every weight-block fetch
    per tile and pays per-step sequencing overhead — measurable on a
    forward-only kernel where each 128-ray tile is only ~5us of MXU
    work. Here weights load once and tiles stream through registers."""
    P = TR * S
    L = num_freqs
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST

    # SAMPLE-MAJOR point order along lanes: p = s*TR + r. This makes
    # per-ray -> per-point expansion an exact lane-tile (pltpu.repeat)
    # and the final per-ray reduce a lane-halving adder tree — no
    # selector matmuls, no (TR, P) selector matrix in VMEM.
    s_row = _iota2((1, P), 1) // TR  # sample slot per point
    t = s_row.astype(f32) / (S - 1)
    z_row = near * (1.0 - t) + far * t  # (1, P)
    # Fourier features: theta = B @ pts with B[k*3+c, c] = 2^k (exact
    # power-of-two entries).
    r_ids = _iota2((3 * L, 3), 0)
    c_ids = _iota2((3 * L, 3), 1)
    B = jnp.where(r_ids % 3 == c_ids, jnp.exp2((r_ids // 3).astype(f32)), 0.0)

    from tinynerf_tpu.kernels.scans import prefix_product_exclusive, sum_over_samples

    def dense(h, w_ref, b_ref):  # W^T (out,in) @ h (in,P) + b (out,1)
        return (
            jnp.dot(
                w_ref[:].astype(compute_dtype),
                h.astype(compute_dtype),
                preferred_element_type=f32,
            )
            + b_ref[:]
        )

    def tile(ti):
        start = pl.multiple_of(ti * TR, TR) if not isinstance(ti, int) else ti * TR
        sl = pl.ds(start, TR)
        o_t, d_t = o_ref[:, sl], d_ref[:, sl]

        norm = jnp.sqrt(jnp.sum(d_t * d_t, axis=0, keepdims=True))  # (1, TR)
        odn = pltpu.repeat(
            jnp.concatenate([o_t, d_t, norm], axis=0), S, axis=1
        )  # (7, P): S concatenated copies == sample-major expansion
        pts = odn[0:3] + odn[3:6] * z_row  # (3, P)
        theta = jnp.dot(B, pts, preferred_element_type=f32, precision=HI)  # (3L, P)
        enc = jnp.concatenate([pts, jnp.sin(theta), jnp.cos(theta)], axis=0)

        h = enc
        for i in range(n_layers):
            h = jnp.maximum(dense(h, wb_refs[2 * i], wb_refs[2 * i + 1]), 0.0)
            if i == skip_at - 1:
                h = jnp.concatenate([h, enc], axis=0)
        head4 = dense(h, wb_refs[2 * n_layers], wb_refs[2 * n_layers + 1])  # (4, P)
        rgb = jax.nn.sigmoid(head4[0:3])
        sigma = jnp.maximum(head4[3:4], 0.0)  # (1, P)

        # Deltas: uniform spacing except the 1e10 terminal, scaled by
        # ||d|| (ref src/volume.py:18-23).
        base = (far - near) / (S - 1)
        delta = jnp.where(s_row == S - 1, DELTA_INF, base) * odn[6:7]

        # one_minus_alpha = exp(-sigma*delta); +eps matches the
        # reference's cumprod(1 - alpha + 1e-10) exactly.
        one_m = jnp.exp(-sigma * delta) + TRANS_EPS  # (1, P)
        alpha = 1.0 - (one_m - TRANS_EPS)

        # Per-ray exclusive transmittance + reduction in the dense
        # (S, TR) layout (kernels/scans.py).
        trans = prefix_product_exclusive(one_m, S, TR)
        w = alpha * trans  # (1, P)
        out_ref[:, sl] = sum_over_samples(
            jnp.concatenate([rgb * w, w], axis=0), S, TR
        )  # (4, TR)

    # Unroll small tile counts (lets the scheduler interleave); beyond
    # ~16 use fori_loop — unrolling 30+ tile bodies hangs Mosaic
    # compilation for minutes (CLAUDE.md gotcha).
    if n_tiles <= 16:
        for ti in range(n_tiles):
            tile(ti)
    else:
        jax.lax.fori_loop(0, n_tiles, lambda ti, c: (tile(ti), c)[1], 0)


def _prepare_weights(params, num_freqs: int, skip_at: int):
    """Permute + transpose model weights into the kernel layout."""
    perm = _encode_permutation(num_freqs)
    layers = params["layers"]
    wbs = []
    for i, layer in enumerate(layers):
        w = layer["w"].astype(jnp.float32)
        if i == 0:
            w = jnp.take(w, perm, axis=0)
        elif i == skip_at:  # first layer after the concat: [h, enc] rows
            hidden = layers[0]["w"].shape[1]
            w = jnp.concatenate(
                [w[:hidden], jnp.take(w[hidden:], perm, axis=0)], axis=0
            )
        wbs.append(w.T)  # (out, in)
        wbs.append(layer["b"].astype(jnp.float32).reshape(-1, 1))
    # Combined head: rows 0-2 rgb logits, row 3 sigma pre-activation.
    wh = jnp.concatenate(
        [params["rgb"]["w"].astype(jnp.float32), params["sigma"]["w"].astype(jnp.float32)],
        axis=1,
    ).T  # (4, hidden)
    bh = jnp.concatenate(
        [params["rgb"]["b"].astype(jnp.float32), params["sigma"]["b"].astype(jnp.float32)]
    ).reshape(4, 1)
    wbs.extend([wh, bh])
    return wbs


def fused_render_rays(
    params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    *,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    num_freqs: int = 10,
    white_bkgd: bool = True,
    model_cfg: TinyNeRFConfig = TinyNeRFConfig(),
    tile_r: int = DEFAULT_TILE_R,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Deterministic fused render of a ray batch -> composite RGB (R, 3).

    Drop-in replacement for the unfused render.render_rays path
    (un-jittered stratified samples, ref src/train.py:51-57 semantics).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = rays_o.shape[0]
    S = n_samples
    n_tiles = -(-R // tile_r)
    pad = n_tiles * tile_r - R
    o_t = jnp.pad(rays_o.astype(jnp.float32), ((0, pad), (0, 0))).T  # (3, R')
    d_t = jnp.concatenate(
        [
            rays_d.astype(jnp.float32),
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3)),
        ],
        axis=0,
    ).T  # (3, R')

    wbs = _prepare_weights(params, num_freqs, model_cfg.skip_at)

    kernel = functools.partial(
        _fused_kernel,
        TR=tile_r,
        n_tiles=n_tiles,
        S=S,
        num_freqs=num_freqs,
        n_layers=model_cfg.depth,
        skip_at=model_cfg.skip_at,
        near=float(near),
        far=float(far),
        compute_dtype=model_cfg.compute_dtype,
    )

    full_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    pts_per_tile = tile_r * S
    mac = sum(int(np.prod(w.shape)) for w in wbs[::2])
    cost = pl.CostEstimate(
        flops=int(2 * pts_per_tile * mac * 1.15) * n_tiles,
        bytes_accessed=(R + pad) * (6 + 4) * 4 + 2 * mac * 4,
        transcendentals=pts_per_tile * (6 * num_freqs + 6) * n_tiles,
    )

    out = pl.pallas_call(
        lambda o, d, *wb_and_out: kernel(o, d, *wb_and_out[:-1], out_ref=wb_and_out[-1]),
        in_specs=[full_spec(), full_spec()] + [full_spec() for _ in wbs],
        out_specs=full_spec(),
        out_shape=jax.ShapeDtypeStruct((4, R + pad), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, *wbs)

    out = out.T  # (R', 4)
    comp = out[:R, :3]
    if white_bkgd:
        comp = comp + (1.0 - out[:R, 3:4])
    return comp
