"""Pinhole-camera ray generation.

Behavioral parity with the reference's `src/rays.py:3-33`: pixel grid in
"xy" indexing, camera looks along -z, directions rotated by c2w[:3,:3]
and unit-normalized, origins broadcast from c2w[:3,3].

TPU-first design notes: a single fused jnp expression (no host loops),
batched over poses with `jax.vmap` so precomputing rays for all N poses
is one XLA program instead of the reference's Python loop over poses
(`src/train.py:94-101`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_rays(H: int, W: int, focal, c2w: jax.Array):
    """Generate ray origins and unit directions for one camera pose.

    Args:
      H, W: static image size (Python ints).
      focal: scalar focal length in pixels (Python float or 0-d array).
      c2w: (4, 4) or (3, 4) camera-to-world matrix.

    Returns:
      rays_o: (H*W, 3) ray origins (camera center, broadcast).
      rays_d: (H*W, 3) unit ray directions in world coordinates.

    Pixel (w, h) maps to camera-frame direction
    [(w - W/2)/focal, -(h - H/2)/focal, -1]  (ref src/rays.py:21-25).
    """
    c2w = jnp.asarray(c2w, dtype=jnp.float32)
    # i varies along width (x), j along height (y): "xy" meshgrid semantics.
    i = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
    j = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
    dirs = jnp.stack(
        [
            (i - W * 0.5) / focal,
            -(j - H * 0.5) / focal,
            -jnp.ones_like(i),
        ],
        axis=-1,
    ).reshape(-1, 3)  # (H*W, 3)

    R = c2w[:3, :3]
    t = c2w[:3, 3]
    # HIGHEST: TPU f32 matmuls default to one bf16 pass; ray directions
    # feed sin(2^(L-1) * x) encodings, so bf16 truncation here would
    # corrupt the high-frequency features.
    rays_d = jnp.matmul(dirs, R.T, precision=jax.lax.Precision.HIGHEST)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(t, rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal, near, rays_o: jax.Array, rays_d: jax.Array):
    """Shift rays to NDC space (forward-facing scenes, NeRF paper
    appendix C). No reference counterpart (the reference handles only
    inward-facing 360 scenes) — capability upgrade for LLFF-style data.

    After shifting origins to the z=-near plane, the projective map
    sends the viewing frustum to the [-1,1]^3 cube so uniform samples
    in t in [0,1] correspond to uniform DISPARITY in world space.
    """
    rays_o = jnp.asarray(rays_o, jnp.float32)
    rays_d = jnp.asarray(rays_d, jnp.float32)
    # Shift origins to the near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]
    o0 = -focal / (0.5 * W) * ox / oz
    o1 = -focal / (0.5 * H) * oy / oz
    o2 = 1.0 + 2.0 * near / oz
    d0 = -focal / (0.5 * W) * (dx / dz - ox / oz)
    d1 = -focal / (0.5 * H) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz
    return (
        jnp.stack([o0, o1, o2], axis=-1),
        jnp.stack([d0, d1, d2], axis=-1),
    )


def get_rays_for_poses(H: int, W: int, focal, c2ws: jax.Array):
    """Batched ray generation for a stack of poses.

    Args:
      c2ws: (N, 4, 4) camera-to-world matrices.

    Returns:
      rays_o, rays_d: each (N, H*W, 3).

    Replaces the reference's host-side loop over poses
    (src/train.py:94-101) with one vmapped XLA computation.
    """
    return jax.vmap(lambda p: get_rays(H, W, focal, p))(c2ws)
