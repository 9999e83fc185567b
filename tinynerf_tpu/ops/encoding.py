"""Fourier positional encoding gamma(x).

Feature order matches the reference (`src/encoding.py:21-33`):
[x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] with frequency
bands f_k = 2^k, k = 0..L-1; L=10 with include_input gives out_dim 63.

TPU-first: one vectorized expression (outer product + stacked sin/cos),
no Python-loop concat of 2L small tensors; the whole encode fuses into
the downstream matmul under XLA, and the Pallas kernel in
`kernels/fused_render.py` re-derives the same features in-register.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encoding_dim(num_freqs: int = 10, include_input: bool = True, in_dim: int = 3) -> int:
    """Output feature dim: in_dim*2*L (+ in_dim if include_input)."""
    return in_dim * 2 * num_freqs + (in_dim if include_input else 0)


def positional_encoding(
    x: jax.Array, num_freqs: int = 10, include_input: bool = True
) -> jax.Array:
    """Encode (..., D) coords to (..., encoding_dim) Fourier features.

    Matches reference ordering exactly: optional raw input first, then
    per-frequency [sin, cos] blocks interleaved (src/encoding.py:27-32).
    """
    x = jnp.asarray(x)
    d = x.shape[-1]
    bands = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # (L,)
    scaled = x[..., None, :] * bands[:, None]  # (..., L, D)
    # (..., L, 2, D): [:, 0] = sin, [:, 1] = cos  -> flattens to
    # [sin f0 (D), cos f0 (D), sin f1 (D), ...] matching the reference.
    sincos = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)
    feats = sincos.reshape(*x.shape[:-1], num_freqs * 2 * d)
    if include_input:
        feats = jnp.concatenate([x, feats], axis=-1)
    return feats
