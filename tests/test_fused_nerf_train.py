"""Fused hierarchical NeRF train kernels: gradient parity vs jax.grad
of the unfused hierarchical loss (deterministic depths, interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.kernels.fused_nerf_train import (
    fused_nerf_pass_grads,
    make_fused_nerf_grad_fn,
)
from tinynerf_tpu.models.nerf import (
    NeRFConfig,
    init_nerf,
    make_hierarchical_loss,
    render_rays_hierarchical,
)
from tinynerf_tpu.training import TrainSettings, init_train_state

TINY = NeRFConfig(
    num_freqs=4, num_freqs_dir=2, hidden=32, depth=3, skip_at=2, rgb_hidden=16,
    compute_dtype=jnp.float32,
)


def _case(R=32, S=8, seed=0):
    s = TrainSettings(n_rand=R, n_samples=S, num_freqs=TINY.num_freqs)
    params = init_nerf(jax.random.PRNGKey(seed), TINY)
    rng = np.random.RandomState(seed)
    ro = jnp.asarray((rng.randn(R, 3) * 0.1).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    return s, params, ro, rd, target


def _ref_hier_loss(params, ro, rd, target, s, n_fine):
    comp_c, comp_f = render_rays_hierarchical(
        params, ro, rd, n_coarse=s.n_samples, n_fine=n_fine,
        near=s.near, far=s.far, white_bkgd=s.white_bkgd, cfg=TINY,
        randomized=False,
    )
    t = target.astype(jnp.float32)
    return jnp.mean((comp_c - t) ** 2) + jnp.mean((comp_f - t) ** 2)


def _assert_close(ref, got, rtol=3e-4):
    flat_r, tr = jax.tree_util.tree_flatten(ref)
    flat_g, tg = jax.tree_util.tree_flatten(got)
    assert str(tr) == str(tg)
    for a, b in zip(flat_r, flat_g):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=rtol * scale + 1e-8
        )


def test_hierarchical_grads_match_jax_grad():
    s, params, ro, rd, target = _case()
    n_fine = 8
    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: _ref_hier_loss(p, ro, rd, target, s, n_fine)
    )(params)

    grad_fn = make_fused_nerf_grad_fn(
        s, TINY, n_fine=n_fine, tile_r=32, randomized=False, interpret=True
    )
    grads, metrics = grad_fn(params, ro, rd, target, jax.random.PRNGKey(0))
    total = float(metrics["loss"]) + 0.0  # fine loss
    # Compare total objective value.
    np.testing.assert_allclose(
        float(metrics["loss_coarse"]) + float(metrics["loss"]),
        float(ref_loss),
        atol=1e-6,
    )
    _assert_close(ref_grads, grads)


def test_single_pass_no_viewdirs_grads():
    import dataclasses

    cfg = dataclasses.replace(TINY, use_viewdirs=False)
    s, _, ro, rd, target = _case(seed=3)
    from tinynerf_tpu.models.nerf import init_nerf_mlp, apply_nerf_mlp
    from tinynerf_tpu.ops.encoding import positional_encoding
    from tinynerf_tpu.ops.sampling import stratified_samples
    from tinynerf_tpu.ops.volume import volume_render

    mlp = init_nerf_mlp(jax.random.PRNGKey(3), cfg)

    def ref_loss(m):
        z, pts = stratified_samples(s.near, s.far, s.n_samples, ro, rd, randomized=False)
        x = positional_encoding(pts.reshape(-1, 3), num_freqs=cfg.num_freqs)
        rgb, sig = apply_nerf_mlp(m, x, None, cfg)
        R = ro.shape[0]
        comp, _, _, _ = volume_render(
            rgb.reshape(R, s.n_samples, 3), sig.reshape(R, s.n_samples), z, rd
        )
        return jnp.mean((comp - target) ** 2)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(mlp)
    loss, grads = fused_nerf_pass_grads(
        mlp, ro, rd, target, 0,
        n_samples=s.n_samples, randomized=False, cfg=cfg,
        tile_r=32, interpret=True,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), atol=1e-6)
    _assert_close(ref_g, grads)


def test_fused_nerf_training_learns():
    from tinynerf_tpu.training import make_train_block

    s, params, ro, rd, target = _case(R=64, S=8, seed=1)
    grad_fn = make_fused_nerf_grad_fn(
        s, TINY, n_fine=8, tile_r=32, randomized=False, interpret=True
    )
    block = make_train_block(s, 15, grad_fn=grad_fn)
    params, opt_state = init_train_state(
        jax.random.PRNGKey(0), s, init_fn=lambda k: init_nerf(k, TINY)
    )
    data = (ro[None], rd[None], target[None])
    key = jax.random.PRNGKey(2)
    losses = []
    for b in range(3):
        params, opt_state, m = block(params, opt_state, key, jnp.int32(b * 15), *data)
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_hierarchical_grads_fori_tile_path():
    """n_tiles > _UNROLL_TILES exercises the lax.fori_loop tile loop
    (traced pl.ds slices + in-loop emit_sampling writes)."""
    s, params, ro, rd, target = _case(R=64, S=8, seed=5)
    n_fine = 8
    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: _ref_hier_loss(p, ro, rd, target, s, n_fine)
    )(params)

    grad_fn = make_fused_nerf_grad_fn(
        s, TINY, n_fine=n_fine, tile_r=8, randomized=False, interpret=True
    )
    grads, metrics = grad_fn(params, ro, rd, target, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(metrics["loss_coarse"]) + float(metrics["loss"]),
        float(ref_loss),
        atol=1e-6,
    )
    _assert_close(ref_grads, grads)
