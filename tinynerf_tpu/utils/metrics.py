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


def ssim(
    pred: jax.Array,
    target: jax.Array,
    window: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Structural similarity for (H, W, C) images in [0, 1].

    Gaussian-windowed SSIM (the variant NeRF papers report alongside
    PSNR; the reference reports PSNR only). Pure jnp: the window is a
    separable depthwise convolution, jit/TPU-friendly. The window//2
    border of the SSIM map (where edge-replicate padding biases the
    local statistics) is cropped before averaging, matching the
    valid-window convention of skimage/NeRF eval scripts so headline
    numbers are comparable to published figures.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    half = window // 2
    coords = jnp.arange(window, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)

    def blur(img):  # separable gaussian over H and W, per channel
        # (H, W, C): convolve rows then columns via correlation.
        pad = [(half, half), (0, 0), (0, 0)]
        x = jnp.pad(img, pad, mode="edge")
        x = sum(g[i] * x[i : i + img.shape[0]] for i in range(window))
        pad = [(0, 0), (half, half), (0, 0)]
        x = jnp.pad(x, pad, mode="edge")
        x = sum(g[i] * x[:, i : i + img.shape[1]] for i in range(window))
        return x

    mu_p, mu_t = blur(pred), blur(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sig_p = blur(pred * pred) - mu_pp
    sig_t = blur(target * target) - mu_tt
    sig_pt = blur(pred * target) - mu_pt
    c1, c2 = k1**2, k2**2
    num = (2 * mu_pt + c1) * (2 * sig_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sig_p + sig_t + c2)
    ssim_map = num / den
    return jnp.mean(ssim_map[half:-half, half:-half])
