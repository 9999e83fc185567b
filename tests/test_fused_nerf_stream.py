"""Streamed (sample-block) fused NeRF train kernel: gradient parity vs
jax.grad of the unfused loss and vs the monolithic kernel (interpret)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.kernels.fused_nerf_stream import fused_nerf_pass_grads_streamed
from tinynerf_tpu.kernels.fused_nerf_train import fused_nerf_pass_grads
from tinynerf_tpu.models.nerf import NeRFConfig, apply_nerf_mlp, init_nerf_mlp
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.ops.volume import volume_render

TINY = NeRFConfig(
    num_freqs=4, num_freqs_dir=2, hidden=32, depth=3, skip_at=2, rgb_hidden=16,
    compute_dtype=jnp.float32,
)


def _case(R=32, S=16, seed=0):
    rng = np.random.RandomState(seed)
    mlp = init_nerf_mlp(jax.random.PRNGKey(seed), TINY)
    ro = jnp.asarray((rng.randn(R, 3) * 0.1).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    # Sorted per-ray depth union like the hierarchical fine pass.
    z = np.sort(rng.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=1)
    return mlp, ro, rd, target, jnp.asarray(z)


def _ref_loss(mlp, ro, rd, target, z, cfg):
    R, S = z.shape
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    x = positional_encoding(pts.reshape(-1, 3), num_freqs=cfg.num_freqs)
    if cfg.use_viewdirs:
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        d_enc = jnp.repeat(
            positional_encoding(vd, num_freqs=cfg.num_freqs_dir), S, axis=0
        )
    else:
        d_enc = None
    rgb, sig = apply_nerf_mlp(mlp, x, d_enc, cfg)
    comp, _, _, _ = volume_render(
        rgb.reshape(R, S, 3), sig.reshape(R, S), z, rd, white_bkgd=True
    )
    return jnp.mean((comp - target) ** 2)


def _assert_close(ref, got, rtol=3e-4):
    flat_r, tr = jax.tree_util.tree_flatten(ref)
    flat_g, tg = jax.tree_util.tree_flatten(got)
    assert str(tr) == str(tg)
    for a, b in zip(flat_r, flat_g):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=rtol * scale + 1e-8
        )


@pytest.mark.parametrize("peel", [False, True])
@pytest.mark.parametrize(
    "R,S,tile_r,sb",
    [
        (32, 16, 16, 4),  # multi-tile x multi-block
        (32, 16, 32, 16),  # single tile, single block (NB=1 edge)
        (16, 24, 16, 8),  # S not a power of two blocks (NB=3)
    ],
)
def test_streamed_grads_match_jax_grad(R, S, tile_r, sb, peel):
    mlp, ro, rd, target, z = _case(R=R, S=S)
    ref_l, ref_g = jax.value_and_grad(
        lambda m: _ref_loss(m, ro, rd, target, z, TINY)
    )(mlp)
    loss, grads = fused_nerf_pass_grads_streamed(
        mlp, ro, rd, target, z, cfg=TINY, tile_r=tile_r, sample_block=sb,
        interpret=True, peel_last_block=peel,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), atol=1e-6)
    _assert_close(ref_g, grads)


def test_peel_matches_unpeeled_to_ulp():
    """peel_last_block skips a remat whose scratch contents are exactly
    the forward's — same values through the same math, so gradients
    must agree to ulp-level (the peeled straight-line block and the
    loop body compile separately, so FMA fusion can differ by an ulp;
    includes sigma noise so the noisy remat path is covered too)."""
    mlp, ro, rd, target, z = _case(R=32, S=16, seed=3)
    noise = jnp.asarray(
        np.random.RandomState(5).randn(32, 16).astype(np.float32)
    )
    for sb in (4, 16):  # NB=4 and the NB=1 edge (whole backward peeled)
        l0, g0 = fused_nerf_pass_grads_streamed(
            mlp, ro, rd, target, z, sigma_noise=noise, cfg=TINY,
            tile_r=16, sample_block=sb, interpret=True,
            peel_last_block=False,
        )
        l1, g1 = fused_nerf_pass_grads_streamed(
            mlp, ro, rd, target, z, sigma_noise=noise, cfg=TINY,
            tile_r=16, sample_block=sb, interpret=True,
            peel_last_block=True,
        )
        assert float(l0) == float(l1)  # loss is forward-only: identical
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-9
            )


def test_streamed_matches_monolithic_kernel():
    mlp, ro, rd, target, z = _case(R=32, S=16, seed=7)
    l_mono, g_mono = fused_nerf_pass_grads(
        mlp, ro, rd, target, 0, z_vals=z, randomized=False, cfg=TINY,
        tile_r=16, interpret=True,
    )
    l_str, g_str = fused_nerf_pass_grads_streamed(
        mlp, ro, rd, target, z, cfg=TINY, tile_r=16, sample_block=4,
        interpret=True,
    )
    np.testing.assert_allclose(float(l_str), float(l_mono), rtol=1e-6)
    _assert_close(g_mono, g_str, rtol=1e-5)


def test_streamed_no_viewdirs():
    cfg = dataclasses.replace(TINY, use_viewdirs=False)
    rng = np.random.RandomState(2)
    mlp = init_nerf_mlp(jax.random.PRNGKey(2), cfg)
    _, ro, rd, target, z = _case(R=16, S=8, seed=2)
    ref_l, ref_g = jax.value_and_grad(
        lambda m: _ref_loss(m, ro, rd, target, z, cfg)
    )(mlp)
    loss, grads = fused_nerf_pass_grads_streamed(
        mlp, ro, rd, target, z, cfg=cfg, tile_r=16, sample_block=4,
        interpret=True,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), atol=1e-6)
    _assert_close(ref_g, grads)


@pytest.mark.parametrize("peel", [False, True])
def test_hierarchical_grad_fn_with_streamed_fine(peel):
    """make_fused_nerf_grad_fn(sample_block=...) routes the fine pass
    through the streamed kernel; parity vs jax.grad of the unfused
    hierarchical loss (deterministic depths)."""
    from tinynerf_tpu.kernels.fused_nerf_train import make_fused_nerf_grad_fn
    from tinynerf_tpu.models.nerf import init_nerf, render_rays_hierarchical
    from tinynerf_tpu.training import TrainSettings

    R, n_fine = 32, 8
    s = TrainSettings(n_rand=R, n_samples=8, num_freqs=TINY.num_freqs)
    params = init_nerf(jax.random.PRNGKey(4), TINY)
    rng = np.random.RandomState(4)
    ro = jnp.asarray((rng.randn(R, 3) * 0.1).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))

    def ref(p):
        comp_c, comp_f = render_rays_hierarchical(
            p, ro, rd, n_coarse=s.n_samples, n_fine=n_fine, near=s.near,
            far=s.far, white_bkgd=s.white_bkgd, cfg=TINY, randomized=False,
        )
        t = target.astype(jnp.float32)
        return jnp.mean((comp_c - t) ** 2) + jnp.mean((comp_f - t) ** 2)

    ref_l, ref_g = jax.value_and_grad(ref)(params)
    grad_fn = make_fused_nerf_grad_fn(
        s, TINY, n_fine=n_fine, tile_r=32, randomized=False, interpret=True,
        sample_block=4, peel_last_block=peel,
    )
    grads, metrics = grad_fn(params, ro, rd, target, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(metrics["loss_coarse"]) + float(metrics["loss"]),
        float(ref_l),
        atol=1e-6,
    )
    _assert_close(ref_g, grads)


def test_streamed_render_matches_monolithic():
    """Forward-only streamed render == monolithic fused render on the
    same depth union (includes a padded, non-multiple-of-tile R)."""
    from tinynerf_tpu.kernels.fused_nerf import fused_nerf_render_rays
    from tinynerf_tpu.kernels.fused_nerf_stream import (
        fused_nerf_render_rays_streamed,
    )

    mlp, ro, rd, _, z = _case(R=24, S=16, seed=9)  # 24 pads to 2x16 tiles
    mono = fused_nerf_render_rays(
        mlp, ro, rd, z, cfg=TINY, tile_r=16, interpret=True
    )
    stream = fused_nerf_render_rays_streamed(
        mlp, ro, rd, z, cfg=TINY, tile_r=16, sample_block=4, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(stream), np.asarray(mono), atol=1e-5
    )


def test_hierarchical_render_streamed_fine_parity():
    """fused_render_rays_hierarchical(sample_block=...) equals the
    unfused hierarchical render (deterministic)."""
    from tinynerf_tpu.kernels.fused_nerf import fused_render_rays_hierarchical
    from tinynerf_tpu.models.nerf import init_nerf, render_rays_hierarchical

    params = init_nerf(jax.random.PRNGKey(11), TINY)
    _, ro, rd, _, _ = _case(R=32, S=8, seed=11)
    ref_c, ref_f = render_rays_hierarchical(
        params, ro, rd, n_coarse=8, n_fine=8, cfg=TINY, randomized=False
    )
    got_c, got_f = fused_render_rays_hierarchical(
        params, ro, rd, n_coarse=8, n_fine=8, cfg=TINY, tile_r=16,
        interpret=True, sample_block=4,
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f), atol=2e-4)


def test_streamed_shape_validation():
    mlp, ro, rd, target, z = _case(R=16, S=8)
    with pytest.raises(ValueError, match="sample_block"):
        fused_nerf_pass_grads_streamed(
            mlp, ro, rd, target, z, cfg=TINY, tile_r=16, sample_block=3,
            interpret=True,
        )
