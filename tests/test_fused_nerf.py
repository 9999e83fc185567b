"""Fused full-NeRF kernel parity (interpret mode) vs models/nerf.py."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.kernels.fused_nerf import (
    fused_nerf_render_rays,
    fused_render_rays_hierarchical,
)
from tinynerf_tpu.models.nerf import (
    NeRFConfig,
    apply_nerf_mlp,
    init_nerf,
    init_nerf_mlp,
    render_rays_hierarchical,
)
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.ops.sampling import stratified_samples
from tinynerf_tpu.ops.volume import volume_render

TINY = NeRFConfig(
    num_freqs=4, num_freqs_dir=2, hidden=32, depth=3, skip_at=2, rgb_hidden=16,
    compute_dtype=jnp.float32,
)


def _rays(n, seed=0):
    rng = np.random.RandomState(seed)
    ro = (rng.randn(n, 3) * 0.1).astype(np.float32)
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def _unfused_pass(mlp, ro, rd, z, cfg, white_bkgd=True):
    n_rays, S = z.shape
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    x_enc = positional_encoding(pts.reshape(-1, 3), num_freqs=cfg.num_freqs)
    if cfg.use_viewdirs:
        vdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        d_enc = jnp.repeat(
            positional_encoding(vdirs, num_freqs=cfg.num_freqs_dir), S, axis=0
        )
    else:
        d_enc = None
    rgb, sigma = apply_nerf_mlp(mlp, x_enc, d_enc, cfg)
    comp, _, _, w = volume_render(
        rgb.reshape(n_rays, S, 3), sigma.reshape(n_rays, S), z, rd,
        white_bkgd=white_bkgd,
    )
    return comp, w


def test_single_pass_parity_analytic_z():
    mlp = init_nerf_mlp(jax.random.PRNGKey(0), TINY)
    ro, rd = _rays(40)
    z, _ = stratified_samples(2.0, 6.0, 16, ro, rd, randomized=False)
    want, want_w = _unfused_pass(mlp, ro, rd, z, TINY)
    got, got_w = fused_nerf_render_rays(
        mlp, ro, rd, n_samples=16, cfg=TINY, return_weights=True,
        tile_r=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w), atol=5e-4)


def test_single_pass_parity_z_input():
    """Caller-provided (possibly nonuniform) depths through the z path."""
    mlp = init_nerf_mlp(jax.random.PRNGKey(1), TINY)
    ro, rd = _rays(32, seed=2)
    rng = np.random.RandomState(3)
    z = jnp.asarray(np.sort(2 + 4 * rng.rand(32, 24).astype(np.float32), axis=-1))
    want, _ = _unfused_pass(mlp, ro, rd, z, TINY)
    got = fused_nerf_render_rays(
        mlp, ro, rd, z, cfg=TINY, tile_r=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_no_viewdirs_variant():
    import dataclasses

    cfg = dataclasses.replace(TINY, use_viewdirs=False)
    mlp = init_nerf_mlp(jax.random.PRNGKey(2), cfg)
    ro, rd = _rays(32, seed=4)
    z, _ = stratified_samples(2.0, 6.0, 8, ro, rd, randomized=False)
    want, _ = _unfused_pass(mlp, ro, rd, z, cfg)
    got = fused_nerf_render_rays(
        mlp, ro, rd, n_samples=8, cfg=cfg, tile_r=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_hierarchical_pipeline_parity():
    params = init_nerf(jax.random.PRNGKey(0), TINY)
    ro, rd = _rays(32, seed=5)
    want_c, want_f = render_rays_hierarchical(
        params, ro, rd, n_coarse=16, n_fine=8, cfg=TINY, randomized=False
    )
    got_c, got_f = fused_render_rays_hierarchical(
        params, ro, rd, n_coarse=16, n_fine=8, cfg=TINY,
        tile_r=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f), atol=1e-3)
