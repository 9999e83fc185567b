"""Tests for Fourier positional encoding (parity with src/encoding.py)."""

import numpy as np
import jax.numpy as jnp

from tinynerf_tpu.ops.encoding import encoding_dim, positional_encoding


def _numpy_reference_encoding(x, L, include_input=True):
    """Independent numpy version with the reference's interleaved order."""
    out = [x] if include_input else []
    for k in range(L):
        f = 2.0**k
        out.append(np.sin(x * f))
        out.append(np.cos(x * f))
    return np.concatenate(out, axis=-1)


def test_out_dim():
    assert encoding_dim(10, True) == 63
    assert encoding_dim(10, False) == 60
    assert encoding_dim(6, True) == 39
    assert encoding_dim(4, True, in_dim=2) == 18


def test_matches_numpy_reference(rng):
    x = rng.randn(17, 3).astype(np.float32)
    for L in (1, 4, 10):
        for include in (True, False):
            got = np.asarray(positional_encoding(jnp.asarray(x), L, include))
            want = _numpy_reference_encoding(x, L, include)
            assert got.shape == (17, encoding_dim(L, include))
            np.testing.assert_allclose(got, want, atol=1e-5)


def test_golden_values():
    x = jnp.array([[0.5, 0.0, -1.0]])
    got = np.asarray(positional_encoding(x, num_freqs=2))
    # layout: [x(3), sin(1x)(3), cos(1x)(3), sin(2x)(3), cos(2x)(3)]
    np.testing.assert_allclose(got[0, :3], [0.5, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(
        got[0, 3:6], [np.sin(0.5), 0.0, np.sin(-1.0)], atol=1e-6
    )
    np.testing.assert_allclose(
        got[0, 6:9], [np.cos(0.5), 1.0, np.cos(-1.0)], atol=1e-6
    )
    np.testing.assert_allclose(
        got[0, 9:12], [np.sin(1.0), 0.0, np.sin(-2.0)], atol=1e-6
    )


def test_batch_shape_polymorphism(rng):
    x = rng.randn(2, 5, 4, 3).astype(np.float32)
    got = positional_encoding(jnp.asarray(x), 3)
    assert got.shape == (2, 5, 4, encoding_dim(3))
