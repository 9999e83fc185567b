"""Tests for the full NeRF (viewdirs + coarse/fine hierarchical)."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.models.nerf import (
    NeRFConfig,
    apply_nerf_mlp,
    init_nerf,
    init_nerf_mlp,
    make_hierarchical_loss,
    render_rays_hierarchical,
)
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.training import TrainSettings, init_train_state, make_train_block

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


def test_mlp_shapes_and_ranges():
    params = init_nerf_mlp(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.RandomState(0).randn(32, TINY.in_dim), jnp.float32)
    d = jnp.asarray(np.random.RandomState(1).randn(32, TINY.dir_dim), jnp.float32)
    rgb, sigma = apply_nerf_mlp(params, x, d, TINY)
    assert rgb.shape == (32, 3) and sigma.shape == (32, 1)
    assert (np.asarray(rgb) > 0).all() and (np.asarray(rgb) < 1).all()
    assert (np.asarray(sigma) >= 0).all()


def test_viewdirs_change_color_not_density():
    params = init_nerf_mlp(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.RandomState(0).randn(8, TINY.in_dim), jnp.float32)
    d1 = jnp.asarray(np.random.RandomState(1).randn(8, TINY.dir_dim), jnp.float32)
    d2 = jnp.asarray(np.random.RandomState(2).randn(8, TINY.dir_dim), jnp.float32)
    rgb1, sig1 = apply_nerf_mlp(params, x, d1, TINY)
    rgb2, sig2 = apply_nerf_mlp(params, x, d2, TINY)
    np.testing.assert_allclose(np.asarray(sig1), np.asarray(sig2))  # density view-indep
    assert np.abs(np.asarray(rgb1) - np.asarray(rgb2)).max() > 1e-6


def test_hierarchical_render_shapes_deterministic():
    params = init_nerf(jax.random.PRNGKey(0), TINY)
    ro, rd = _rays(24)
    c1, f1 = render_rays_hierarchical(
        params, ro, rd, n_coarse=16, n_fine=8, cfg=TINY, randomized=False
    )
    c2, f2 = render_rays_hierarchical(
        params, ro, rd, n_coarse=16, n_fine=8, cfg=TINY, randomized=False
    )
    assert c1.shape == f1.shape == (24, 3)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))  # deterministic eval


def test_hierarchical_jits_and_differentiates():
    params = init_nerf(jax.random.PRNGKey(0), TINY)
    ro, rd = _rays(16, seed=1)
    target = jnp.asarray(np.random.RandomState(3).rand(16, 3), jnp.float32)
    loss_fn = make_hierarchical_loss(TINY, n_fine=8)
    s = TrainSettings(n_rand=16, n_samples=16, num_freqs=4)

    @jax.jit
    def f(p, k):
        return jax.grad(lambda p: loss_fn(p, ro, rd, target, k, s)[0])(p)

    grads = f(params, jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # Both MLPs receive gradient.
    g_coarse = max(float(np.abs(np.asarray(g)).max()) for g in jax.tree_util.tree_leaves(grads["coarse"]))
    g_fine = max(float(np.abs(np.asarray(g)).max()) for g in jax.tree_util.tree_leaves(grads["fine"]))
    assert g_coarse > 0 and g_fine > 0


def test_hierarchical_training_learns():
    s = TrainSettings(n_rand=64, n_samples=16, num_freqs=4, lr=1e-3)
    loss_fn = make_hierarchical_loss(TINY, n_fine=8)
    params, opt_state = init_train_state(
        jax.random.PRNGKey(0), s, init_fn=lambda k: init_nerf(k, TINY)
    )
    rng = np.random.RandomState(0)
    n_images, hw = 2, 36
    rays_o = jnp.asarray(rng.randn(n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    data = (rays_o, jnp.asarray(rd), jnp.asarray(rng.rand(n_images, hw, 3).astype(np.float32)))
    block = make_train_block(s, 40, loss=loss_fn)
    key = jax.random.PRNGKey(0)
    losses = []
    for b in range(3):
        params, opt_state, m = block(params, opt_state, key, jnp.int32(b * 40), *data)
        losses.append(float(m["loss"].mean()))
    assert losses[-1] < losses[0] * 0.9, losses


def test_hierarchical_image_renderer():
    from tinynerf_tpu.render import make_hierarchical_image_renderer

    params = init_nerf(jax.random.PRNGKey(0), TINY)
    renderer = make_hierarchical_image_renderer(
        H=8, W=8, focal=10.0, chunk=32, n_coarse=16, n_fine=8, nerf_cfg=TINY
    )
    img = renderer(params, jnp.eye(4).at[2, 3].set(4.0))
    img = np.asarray(img)
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
