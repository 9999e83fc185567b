"""Image-quality metrics.

`mse2psnr` matches the reference (`src/utils.py:14-15`):
PSNR = -10 * log10(max(mse, 1e-10)). Expected bands for TinyNeRF on the
tiny_nerf data: ~10-15 dB at init, ~23-26 dB after a few thousand steps
(ref src/utils.py:6-9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse2psnr(mse: jax.Array) -> jax.Array:
    """Convert MSE to PSNR in dB, clamped below at 1e-10."""
    mse = jnp.maximum(jnp.asarray(mse, dtype=jnp.float32), 1e-10)
    return -10.0 * jnp.log10(mse)


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """PSNR between two images/arrays in [0, 1]."""
    return mse2psnr(jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2))
