"""Tests for the volume renderer (parity with src/volume.py:3-44)."""

import numpy as np
import jax.numpy as jnp

from tinynerf_tpu.ops.volume import volume_render


def _numpy_reference_composite(rgb, sigma, z_vals, rays_d, white_bkgd=True):
    """Independent numpy implementation of the rendering equation."""
    deltas = np.diff(z_vals, axis=-1)
    deltas = np.concatenate([deltas, np.full_like(deltas[..., :1], 1e10)], -1)
    deltas = deltas * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-sigma * deltas)
    accum = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = np.concatenate([np.ones_like(accum[..., :1]), accum[..., :-1]], -1)
    w = alpha * trans
    comp = (w[..., None] * rgb).sum(-2)
    depth = (w * z_vals).sum(-1, keepdims=True)
    acc = w.sum(-1, keepdims=True)
    if white_bkgd:
        comp = comp + (1.0 - acc)
    return comp, depth, acc, w


def test_matches_numpy_reference(rng):
    R, S = 11, 7
    rgb = rng.rand(R, S, 3).astype(np.float32)
    sigma = np.abs(rng.randn(R, S)).astype(np.float32)
    z = np.sort(2 + 4 * rng.rand(R, S).astype(np.float32), axis=-1)
    rd = rng.randn(R, 3).astype(np.float32)
    for wb in (True, False):
        comp, depth, acc, w = volume_render(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(rd), wb
        )
        comp_r, depth_r, acc_r, w_r = _numpy_reference_composite(rgb, sigma, z, rd, wb)
        np.testing.assert_allclose(np.asarray(comp), comp_r, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), depth_r, atol=1e-4)
        np.testing.assert_allclose(np.asarray(acc), acc_r, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), w_r, atol=1e-5)


def test_sigma_trailing_dim_accepted(rng):
    """(R,S,1) sigma (the reference's shape) equals (R,S)."""
    R, S = 4, 5
    rgb = jnp.asarray(rng.rand(R, S, 3).astype(np.float32))
    sigma = jnp.asarray(np.abs(rng.randn(R, S, 1)).astype(np.float32))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
    rd = jnp.ones((R, 3))
    a = volume_render(rgb, sigma, z, rd)
    b = volume_render(rgb, sigma[..., 0], z, rd)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_zero_density_gives_white_background():
    R, S = 3, 8
    rgb = jnp.full((R, S, 3), 0.3)
    sigma = jnp.zeros((R, S))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
    rd = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (R, 3))
    comp, depth, acc, w = volume_render(rgb, sigma, z, rd, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(comp), 1.0, atol=1e-6)  # pure white
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-6)


def test_opaque_first_sample_dominates():
    """Huge density at sample 0 -> weight ~1 there, composite = its color."""
    R, S = 2, 6
    rgb = np.zeros((R, S, 3), np.float32)
    rgb[:, 0] = [0.2, 0.4, 0.6]
    sigma = np.zeros((R, S), np.float32)
    sigma[:, 0] = 1e6
    z = np.broadcast_to(np.linspace(2.0, 6.0, S, dtype=np.float32), (R, S))
    rd = np.broadcast_to(np.array([0, 0, -1.0], np.float32), (R, 3))
    comp, depth, acc, w = volume_render(
        jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(rd)
    )
    np.testing.assert_allclose(np.asarray(comp[0]), [0.2, 0.4, 0.6], atol=1e-4)
    np.testing.assert_allclose(np.asarray(w[0, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth[0, 0]), 2.0, atol=1e-3)


def test_invariants(rng):
    """acc in [0,1], weights >= 0, weights sum == acc."""
    R, S = 32, 16
    rgb = jnp.asarray(rng.rand(R, S, 3).astype(np.float32))
    sigma = jnp.asarray(np.abs(rng.randn(R, S)).astype(np.float32) * 10)
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
    rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    comp, depth, acc, w = volume_render(rgb, sigma, z, rd, white_bkgd=False)
    acc, w = np.asarray(acc), np.asarray(w)
    assert (w >= 0).all() and (acc >= 0).all() and (acc <= 1 + 1e-5).all()
    np.testing.assert_allclose(w.sum(-1, keepdims=True), acc, atol=1e-5)


def test_bf16_inputs_composited_in_fp32(rng):
    """bf16 rgb/sigma inputs must not NaN/overflow through the 1e10 delta."""
    R, S = 4, 8
    rgb = jnp.asarray(rng.rand(R, S, 3), dtype=jnp.bfloat16)
    sigma = jnp.asarray(np.abs(rng.randn(R, S)), dtype=jnp.bfloat16)
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
    rd = jnp.ones((R, 3))
    comp, _, acc, _ = volume_render(rgb, sigma, z, rd)
    assert comp.dtype == jnp.float32
    assert np.isfinite(np.asarray(comp)).all()
