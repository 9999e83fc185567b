"""Camera-path utilities for novel-view rendering.

`spiral_poses` matches the reference (`src/camera.py:4-12`): circle of
radius r in the reference camera's local xy-plane, n_frames samples of
t over [0, 2*pi] inclusive (first ~= last frame), pose = c2w_ref @ T(t).

TPU-first: built as one batched einsum over all frames instead of a
Python loop of 4x4 matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spiral_poses(c2w_ref: jax.Array, n_frames: int = 60, radius: float = 0.3) -> jax.Array:
    """(n_frames, 4, 4) camera poses circling the reference camera."""
    c2w_ref = jnp.asarray(c2w_ref, dtype=jnp.float32)
    t = jnp.linspace(0.0, 2.0 * jnp.pi, n_frames, dtype=jnp.float32)
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_frames, 4, 4))
    offsets = jnp.stack(
        [radius * jnp.cos(t), radius * jnp.sin(t), jnp.zeros_like(t)], axis=-1
    )  # (n_frames, 3)
    T = T.at[:, :3, 3].set(offsets)
    return jnp.einsum(
        "ij,njk->nik", c2w_ref, T, precision=jax.lax.Precision.HIGHEST
    )
