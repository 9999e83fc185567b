"""Blockwise (sequence-parallel) composite == monolithic composite."""

import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.ops.volume import volume_render, volume_render_blockwise


def _random_case(rng, R=16, S=32):
    rgb = jnp.asarray(rng.rand(R, S, 3).astype(np.float32))
    sigma = jnp.asarray((np.abs(rng.randn(R, S)) * 5).astype(np.float32))
    z = jnp.asarray(np.sort(2 + 4 * rng.rand(R, S).astype(np.float32), axis=-1))
    rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    return rgb, sigma, z, rd


def test_blockwise_matches_monolithic(rng):
    rgb, sigma, z, rd = _random_case(rng)
    ref_comp, ref_depth, ref_acc, _ = volume_render(rgb, sigma, z, rd)
    for n_blocks in (1, 2, 4, 8, 32):
        comp, depth, acc = volume_render_blockwise(rgb, sigma, z, rd, n_blocks)
        np.testing.assert_allclose(np.asarray(comp), np.asarray(ref_comp), atol=2e-5)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth), atol=2e-4)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(ref_acc), atol=2e-5)


def test_blockwise_no_white_bkgd(rng):
    rgb, sigma, z, rd = _random_case(rng, R=4, S=16)
    ref_comp, _, _, _ = volume_render(rgb, sigma, z, rd, white_bkgd=False)
    comp, _, _ = volume_render_blockwise(rgb, sigma, z, rd, 4, white_bkgd=False)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(ref_comp), atol=2e-5)


def test_blockwise_opaque_scene(rng):
    """High-density scene: early termination across block boundaries."""
    rgb, _, z, rd = _random_case(rng, R=8, S=16)
    sigma = jnp.full((8, 16), 100.0)
    ref_comp, ref_depth, _, _ = volume_render(rgb, sigma, z, rd)
    comp, depth, _ = volume_render_blockwise(rgb, sigma, z, rd, 4)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(ref_comp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth), atol=2e-4)
