"""Alpha-composite volume rendering (the NeRF rendering equation).

Behavioral parity with the reference `src/volume.py:3-44`:
  deltas_i = z_{i+1} - z_i, last delta = 1e10, scaled by ||rays_d||
  alpha = 1 - exp(-sigma * delta)
  T_i = exclusive-cumprod of (1 - alpha + 1e-10)
  weights = alpha * T; comp_rgb = sum w*rgb; depth = sum w*z; acc = sum w
  white background adds (1 - acc) to rgb when white_bkgd.

Numerics (TPU-first): composite always runs in float32 even when the
MLP computes in bfloat16 — exp(-sigma * 1e10) and the transmittance
product are the precision-sensitive path (SURVEY.md section 7, hard
part e). The sample axis is the workload's "sequence"; the block
composite below shards it over a mesh (parallel/train.py), and
`kernels/fused_nerf_stream.py` streams it through VMEM in-kernel with
carried (transmittance, rgb, acc) state — both train (fwd+bwd) and
render.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DELTA_INF = 1e10
TRANS_EPS = 1e-10


def volume_render(
    rgb: jax.Array,
    sigma: jax.Array,
    z_vals: jax.Array,
    rays_d: jax.Array,
    white_bkgd: bool = True,
):
    """Composite per-sample (rgb, sigma) along each ray.

    Args:
      rgb:    (N_rays, N_samples, 3) in [0,1].
      sigma:  (N_rays, N_samples, 1) or (N_rays, N_samples), density >= 0.
      z_vals: (N_rays, N_samples) sample depths.
      rays_d: (N_rays, 3) ray directions (scales deltas by their norm).
      white_bkgd: add (1 - acc) white background to the composite.

    Returns:
      comp_rgb: (N_rays, 3)
      depth:    (N_rays, 1)
      acc:      (N_rays, 1)
      weights:  (N_rays, N_samples)
    """
    rgb = rgb.astype(jnp.float32)
    z_vals = z_vals.astype(jnp.float32)
    if sigma.ndim == rgb.ndim:
        sigma = sigma[..., 0]
    sigma = sigma.astype(jnp.float32)

    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    delta_inf = jnp.full_like(deltas[..., :1], DELTA_INF)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)
    deltas = deltas * jnp.linalg.norm(rays_d, axis=-1, keepdims=True).astype(jnp.float32)

    alpha = 1.0 - jnp.exp(-sigma * deltas)
    # Exclusive cumulative transmittance: prepend 1, drop the last term.
    accum = jnp.cumprod(1.0 - alpha + TRANS_EPS, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(accum[..., :1]), accum[..., :-1]], axis=-1)

    weights = alpha * trans
    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1, keepdims=True)
    acc = jnp.sum(weights, axis=-1, keepdims=True)

    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc)

    return comp_rgb, depth, acc, weights


# ---------------------------------------------------------------------------
# Blockwise (sequence-parallel) composite.
#
# The per-ray sample axis is this workload's "sequence"; its sequential
# dependency is the transmittance prefix-product. The composite is
# associative over sample *blocks*: a block summarizes to
#   T = prod(1 - alpha + eps)           (block transmittance)
#   C = sum(w_local * rgb), D = sum(w_local * z), A = sum(w_local)
# and blocks combine with an exclusive product of the T's. This lets
# the sample axis be sharded across devices (parallel/: all_gather of
# tiny per-block summaries instead of the full sample axis) or streamed
# block-by-block through VMEM (kernels/) for sample counts >> 64.
# ---------------------------------------------------------------------------


def composite_block_partials(rgb, sigma, z_vals, deltas, return_weights: bool = False):
    """Summarize one sample block per ray.

    Args:
      rgb:    (..., S_blk, 3), sigma/z_vals/deltas: (..., S_blk) —
      deltas must be the *global* deltas sliced to this block (they
      depend on the next block's first z and the 1e10 terminal delta).
      return_weights: also return the LOCAL weights (..., S_blk) —
        alpha * within-block transmittance; the global per-sample
        weights are these scaled by the block's entry transmittance
        (the exclusive product of preceding blocks' T).

    Returns dict with T (...,), C (..., 3), D (...,), A (...,)
    [, local weights].
    """
    rgb = rgb.astype(jnp.float32)
    sigma = sigma.astype(jnp.float32)
    alpha = 1.0 - jnp.exp(-sigma * deltas)
    one_m = 1.0 - alpha + TRANS_EPS
    accum = jnp.cumprod(one_m, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(accum[..., :1]), accum[..., :-1]], axis=-1)
    w = alpha * trans
    partials = {
        "T": accum[..., -1],
        "C": jnp.sum(w[..., None] * rgb, axis=-2),
        "D": jnp.sum(w * z_vals, axis=-1),
        "A": jnp.sum(w, axis=-1),
    }
    if return_weights:
        return partials, w
    return partials


def combine_block_partials(partials, white_bkgd: bool = True):
    """Combine block summaries stacked on a leading block axis.

    Args:
      partials: dict of arrays with leading dim B (blocks, ordered
        front-to-back): T (B, ...), C (B, ..., 3), D (B, ...), A (B, ...).

    Returns (comp_rgb (..., 3), depth (..., 1), acc (..., 1)).
    """
    T, C, D, A = partials["T"], partials["C"], partials["D"], partials["A"]
    cum = jnp.cumprod(T, axis=0)
    lead = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)  # excl.
    comp_rgb = jnp.sum(lead[..., None] * C, axis=0)
    depth = jnp.sum(lead * D, axis=0)[..., None]
    acc = jnp.sum(lead * A, axis=0)[..., None]
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc)
    return comp_rgb, depth, acc


def global_deltas(z_vals, rays_d):
    """(..., S) deltas with the 1e10 terminal and ||d|| scaling."""
    z_vals = z_vals.astype(jnp.float32)
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], DELTA_INF)], axis=-1
    )
    return deltas * jnp.linalg.norm(rays_d, axis=-1, keepdims=True).astype(jnp.float32)


def volume_render_blockwise(rgb, sigma, z_vals, rays_d, n_blocks: int, white_bkgd=True):
    """Reference-equal composite computed via block partials (for tests
    and as the semantic spec of the sharded/streamed paths)."""
    if sigma.ndim == rgb.ndim:
        sigma = sigma[..., 0]
    *batch, S = z_vals.shape
    assert S % n_blocks == 0, "n_blocks must divide n_samples"
    sb = S // n_blocks
    deltas = global_deltas(z_vals, rays_d)

    def blk(b):
        sl = slice(b * sb, (b + 1) * sb)
        return composite_block_partials(
            rgb[..., sl, :], sigma[..., sl], z_vals[..., sl], deltas[..., sl]
        )

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[blk(b) for b in range(n_blocks)])
    return combine_block_partials(stacked, white_bkgd=white_bkgd)
