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
part e). The sample axis is the workload's "sequence"; for sample
counts far beyond VMEM, `kernels/fused_render.py` streams it blockwise
with carried (transmittance, rgb, depth, acc) state.
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
