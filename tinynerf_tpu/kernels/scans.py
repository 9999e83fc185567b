"""Shared in-kernel scan/layout primitives for the fused Pallas kernels.

All fused kernels lay points out SAMPLE-MAJOR on lanes (p = s*TR + r),
which lane-splits to the dense (S, TR) layout — one ray per column —
where per-ray scans become log2(S) SUBLANE rolls on fully-packed
registers (8x fewer VPU ops than scanning the 1-sublane (1, P) row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _row_iota(S: int, TR: int):
    return jax.lax.broadcasted_iota(jnp.int32, (S, TR), 0)


def prefix_product_exclusive(x_flat: jax.Array, S: int, TR: int) -> jax.Array:
    """Per-ray exclusive prefix product of a (1, S*TR) sample-major row.

    Returns (1, S*TR). Hillis-Steele over sublanes of the (S, TR) view.
    """
    row = _row_iota(S, TR)
    x = x_flat.reshape(S, TR)
    d = 1
    while d < S:
        x = x * jnp.where(row >= d, pltpu.roll(x, shift=d, axis=0), 1.0)
        d *= 2
    return jnp.where(row >= 1, pltpu.roll(x, shift=1, axis=0), 1.0).reshape(1, S * TR)


def suffix_sum_exclusive(x_flat: jax.Array, S: int, TR: int) -> jax.Array:
    """Per-ray exclusive suffix sum (the prefix product's transpose
    direction). pltpu.roll needs non-negative shifts: -k == S-k."""
    row = _row_iota(S, TR)
    y = x_flat.reshape(S, TR)
    d = 1
    while d < S:
        y = y + jnp.where(row <= S - 1 - d, pltpu.roll(y, shift=S - d, axis=0), 0.0)
        d *= 2
    return jnp.where(
        row <= S - 2, pltpu.roll(y, shift=S - 1, axis=0), 0.0
    ).reshape(1, S * TR)


def sum_over_samples(x_flat: jax.Array, S: int, TR: int) -> jax.Array:
    """Per-ray sum of a (k, S*TR) sample-major array -> (k, TR)."""
    k = x_flat.shape[0]
    return jnp.concatenate(
        [
            jnp.sum(x_flat[c : c + 1].reshape(S, TR), axis=0, keepdims=True)
            for c in range(k)
        ],
        axis=0,
    )
