"""Density (raw-sigma) noise regularization: the NeRF paper's
raw_noise_std, added pre-ReLU at train time only.

Why it exists (measured on TPU, round 3): with --ray-sampling pool the
decorrelated early gradient pushes raw sigma negative EVERYWHERE (the
white background explains most pixels), after which every ReLU gradient
is exactly zero and Adam momentum makes the death permanent — the model
renders pure background forever. Noise keeps positive-side excursions
(and therefore gradients) alive. The reference has no equivalent
(src/nerf.py:26 rectifies the raw head directly); default std=0.0 keeps
exact reference parity.

The noise is drawn XLA-side (jax.random.normal, shape (R, S)) and
passed INTO the fused kernels as an input, so fused-vs-unfused parity
is exactly testable with a shared noise array, and the streamed
kernel's rematerialized backward reads the same buffer as its forward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.kernels.fused_nerf_stream import fused_nerf_pass_grads_streamed
from tinynerf_tpu.kernels.fused_nerf_train import fused_nerf_pass_grads
from tinynerf_tpu.kernels.fused_train import fused_loss_grads
from tinynerf_tpu.models.nerf import NeRFConfig, apply_nerf_mlp, init_nerf_mlp
from tinynerf_tpu.models.tinynerf import TinyNeRFConfig, apply_tinynerf
from tinynerf_tpu.ops.encoding import encoding_dim, positional_encoding
from tinynerf_tpu.ops.sampling import stratified_samples
from tinynerf_tpu.ops.volume import volume_render
from tinynerf_tpu.training import TrainSettings, init_train_state, loss_fn

TINY = NeRFConfig(
    num_freqs=4, num_freqs_dir=2, hidden=32, depth=3, skip_at=2, rgb_hidden=16,
    compute_dtype=jnp.float32,
)


def _nerf_case(R=32, S=16, seed=0):
    rng = np.random.RandomState(seed)
    mlp = init_nerf_mlp(jax.random.PRNGKey(seed), TINY)
    ro = jnp.asarray((rng.randn(R, 3) * 0.1).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    z = np.sort(rng.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=1)
    noise = jnp.asarray(rng.randn(R, S).astype(np.float32))  # std 1
    return mlp, ro, rd, target, jnp.asarray(z), noise


def _ref_nerf_loss(mlp, ro, rd, target, z, noise, cfg):
    """Unfused single-pass loss with injected pre-ReLU density noise."""
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
    rgb, sig = apply_nerf_mlp(
        mlp, x, d_enc, cfg, sigma_noise=noise.reshape(-1, 1)
    )
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


def test_monolithic_kernel_noise_grads_match_jax_grad():
    mlp, ro, rd, target, z, noise = _nerf_case()
    ref_l, ref_g = jax.value_and_grad(
        lambda m: _ref_nerf_loss(m, ro, rd, target, z, noise, TINY)
    )(mlp)
    loss, grads = fused_nerf_pass_grads(
        mlp, ro, rd, target, 0, z, sigma_noise=noise,
        randomized=False, cfg=TINY, tile_r=16, interpret=True,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    _assert_close(ref_g, grads)
    # The noise is actually load-bearing: dropping it changes the loss.
    loss0, _ = fused_nerf_pass_grads(
        mlp, ro, rd, target, 0, z,
        randomized=False, cfg=TINY, tile_r=16, interpret=True,
    )
    assert abs(float(loss0) - float(loss)) > 1e-5


def test_streamed_kernel_noise_grads_match_jax_grad():
    """Multi-block streaming: the rematerialized backward must read the
    SAME noise as the forward (block-consistent), or grads diverge."""
    mlp, ro, rd, target, z, noise = _nerf_case(R=32, S=16)
    ref_l, ref_g = jax.value_and_grad(
        lambda m: _ref_nerf_loss(m, ro, rd, target, z, noise, TINY)
    )(mlp)
    loss, grads = fused_nerf_pass_grads_streamed(
        mlp, ro, rd, target, z, sigma_noise=noise,
        cfg=TINY, tile_r=16, sample_block=4, interpret=True,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    _assert_close(ref_g, grads)


def test_tinynerf_kernel_noise_grads_match_jax_grad():
    L, R, S = 4, 64, 16
    cfg = TinyNeRFConfig(
        in_dim=encoding_dim(L), hidden=32, compute_dtype=jnp.float32
    )
    s = TrainSettings(n_rand=R, n_samples=S, num_freqs=L, model_cfg=cfg)
    params, _ = init_train_state(jax.random.PRNGKey(0), s)
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    noise = jnp.asarray(rng.randn(R, S).astype(np.float32))

    def ref(p):
        z, pts = stratified_samples(s.near, s.far, S, ro, rd, randomized=False)
        xenc = positional_encoding(pts.reshape(-1, 3), num_freqs=L)
        rgb, sigma = apply_tinynerf(
            p, xenc, cfg, sigma_noise=noise.reshape(-1, 1)
        )
        comp, _, _, _ = volume_render(
            rgb.reshape(R, S, 3), sigma.reshape(R, S), z, rd, white_bkgd=True
        )
        return jnp.mean((comp - target) ** 2)

    ref_l, ref_g = jax.value_and_grad(ref)(params)
    loss, grads = fused_loss_grads(
        params, ro, rd, target, 0, sigma_noise=noise,
        n_samples=S, randomized=False, num_freqs=L,
        model_cfg=cfg, tile_r=32, interpret=True,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    _assert_close(ref_g, grads)


def test_dead_sigma_recovers_only_with_noise():
    """The sigma-death mechanism itself: with raw sigma pushed far
    negative everywhere, noise-free gradients are EXACTLY zero (ReLU
    dead, white background has no parameter dependence) while noisy
    gradients are not — the regularizer's entire reason to exist."""
    L, R, S = 4, 32, 16
    cfg = TinyNeRFConfig(
        in_dim=encoding_dim(L), hidden=32, compute_dtype=jnp.float32
    )
    s_dead = TrainSettings(n_rand=R, n_samples=S, num_freqs=L, model_cfg=cfg)
    params, _ = init_train_state(jax.random.PRNGKey(0), s_dead)
    params["sigma"]["b"] = params["sigma"]["b"] - 50.0  # kill the head
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    key = jax.random.PRNGKey(2)

    g_dead = jax.grad(
        lambda p: loss_fn(p, ro, rd, target, key, s_dead)[0], has_aux=False
    )(params)
    assert float(jnp.abs(g_dead["sigma"]["w"]).max()) == 0.0
    assert float(jnp.abs(g_dead["layers"][0]["w"]).max()) == 0.0

    import dataclasses

    s_noise = dataclasses.replace(s_dead, sigma_noise_std=100.0)
    g_alive = jax.grad(
        lambda p: loss_fn(p, ro, rd, target, key, s_noise)[0], has_aux=False
    )(params)
    assert float(jnp.abs(g_alive["sigma"]["w"]).max()) > 0.0


def test_hierarchical_loss_noise_finite_and_different():
    from tinynerf_tpu.models.nerf import make_hierarchical_loss

    import dataclasses

    s0 = TrainSettings(n_rand=16, n_samples=8, num_freqs=4)
    s1 = dataclasses.replace(s0, sigma_noise_std=1.0)
    mlp = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(0), TINY),
        "fine": init_nerf_mlp(jax.random.PRNGKey(1), TINY),
    }
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(16, 3).astype(np.float32) * 0.1)
    rd = rng.randn(16, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(16, 3).astype(np.float32))
    key = jax.random.PRNGKey(3)
    loss = make_hierarchical_loss(TINY, n_fine=8)
    l0, _ = loss(mlp, ro, rd, target, key, s0)
    l1, m1 = loss(mlp, ro, rd, target, key, s1)
    assert np.isfinite(float(l1))
    assert abs(float(l1) - float(l0)) > 1e-7
    g = jax.grad(lambda p: loss(p, ro, rd, target, key, s1)[0])(mlp)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g)
    )


def test_fused_grad_fns_with_noise_run():
    """make_fused_*_grad_fn thread sigma_noise_std from TrainSettings
    (interpret mode; noise drawn XLA-side from the step key)."""
    import dataclasses

    from tinynerf_tpu.kernels.fused_nerf_train import make_fused_nerf_grad_fn
    from tinynerf_tpu.kernels.fused_train import make_fused_grad_fn

    cfg = TinyNeRFConfig(
        in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32
    )
    s = TrainSettings(
        n_rand=32, n_samples=16, num_freqs=4, model_cfg=cfg,
        sigma_noise_std=1.0,
    )
    params, _ = init_train_state(jax.random.PRNGKey(0), s)
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(32, 3).astype(np.float32) * 0.1)
    rd = rng.randn(32, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(32, 3).astype(np.float32))
    key = jax.random.PRNGKey(7)

    gfn = make_fused_grad_fn(s, tile_r=32, interpret=True)
    grads, metrics = gfn(params, ro, rd, target, key)
    assert np.isfinite(float(metrics["loss"]))
    assert all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree_util.tree_leaves(grads)
    )

    s_nerf = dataclasses.replace(s, model_cfg=cfg)
    nerf_params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(0), TINY),
        "fine": init_nerf_mlp(jax.random.PRNGKey(1), TINY),
    }
    # Monolithic fine (small S) and streamed fine both exercised.
    for sample_block in (None, 8):
        # randomized=False: the in-kernel hardware PRNG jitter has no
        # interpret-mode lowering on CPU; the noise path (XLA-side
        # draws) is independent of it.
        gfn_n = make_fused_nerf_grad_fn(
            s_nerf, TINY, n_fine=8, tile_r=32, randomized=False,
            interpret=True, sample_block=sample_block,
        )
        grads_n, metrics_n = gfn_n(nerf_params, ro, rd, target, key)
        assert np.isfinite(float(metrics_n["loss"]))
        assert all(
            np.isfinite(np.asarray(x)).all()
            for x in jax.tree_util.tree_leaves(grads_n)
        )


def test_config_threads_sigma_noise_std():
    from tinynerf_tpu.config import Config

    assert Config().train_settings().sigma_noise_std == 0.0
    assert Config(sigma_noise_std=1.0).train_settings().sigma_noise_std == 1.0


def test_noise_off_streams_bit_identical():
    """sigma_noise_std=0.0 must leave the historical RNG streams (and
    therefore all committed trajectories) untouched."""
    cfg = TinyNeRFConfig(
        in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32
    )
    s = TrainSettings(n_rand=16, n_samples=8, num_freqs=4, model_cfg=cfg)
    params, _ = init_train_state(jax.random.PRNGKey(0), s)
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(16, 3).astype(np.float32) * 0.1)
    rd = rng.randn(16, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(16, 3).astype(np.float32))
    key = jax.random.PRNGKey(11)
    l_a, _ = loss_fn(params, ro, rd, target, key, s)
    import dataclasses

    l_b, _ = loss_fn(
        params, ro, rd, target, key, dataclasses.replace(s, sigma_noise_std=0.0)
    )
    np.testing.assert_array_equal(np.asarray(l_a), np.asarray(l_b))


def test_noise_scale_kwargs_schedule():
    """Linear decay hook: {} when off; 1 -> 0 over decay_steps when on."""
    import dataclasses

    from tinynerf_tpu.training import noise_scale_kwargs

    s_off = TrainSettings(sigma_noise_std=1.0)  # no decay configured
    assert noise_scale_kwargs(s_off, 0) == {}
    s_no_noise = TrainSettings(sigma_noise_decay_steps=100)  # std 0
    assert noise_scale_kwargs(s_no_noise, 0) == {}
    s = TrainSettings(sigma_noise_std=1.0, sigma_noise_decay_steps=100)
    assert float(noise_scale_kwargs(s, 0)["noise_scale"]) == 1.0
    assert float(noise_scale_kwargs(s, 50)["noise_scale"]) == 0.5
    assert float(noise_scale_kwargs(s, 100)["noise_scale"]) == 0.0
    assert float(noise_scale_kwargs(s, 10_000)["noise_scale"]) == 0.0
    # works with a traced step too
    assert float(
        jax.jit(lambda t: noise_scale_kwargs(s, t)["noise_scale"])(
            jnp.asarray(25, jnp.int32)
        )
    ) == 0.75


def test_noise_scale_zero_neutralizes_noise_same_key_stream():
    """scale=0 with std>0 must equal an (effectively) zero-noise run on
    the SAME split stream — i.e. the decay endpoint really removes the
    regularizer without perturbing jitter keys."""
    cfg = TinyNeRFConfig(
        in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32
    )
    import dataclasses

    s = TrainSettings(
        n_rand=16, n_samples=8, num_freqs=4, model_cfg=cfg,
        sigma_noise_std=1.0,
    )
    params, _ = init_train_state(jax.random.PRNGKey(0), s)
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(16, 3).astype(np.float32) * 0.1)
    rd = rng.randn(16, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(16, 3).astype(np.float32))
    key = jax.random.PRNGKey(5)

    l_scaled0, _ = loss_fn(params, ro, rd, target, key, s, noise_scale=0.0)
    s_tiny = dataclasses.replace(s, sigma_noise_std=1e-30)  # same splits
    l_ref, _ = loss_fn(params, ro, rd, target, key, s_tiny)
    np.testing.assert_allclose(
        np.asarray(l_scaled0), np.asarray(l_ref), rtol=1e-6
    )
    # and scale=1 differs (the noise is real at full scale)
    l_full, _ = loss_fn(params, ro, rd, target, key, s, noise_scale=1.0)
    assert abs(float(l_full) - float(l_scaled0)) > 1e-7


def test_fused_grad_fns_accept_noise_scale():
    """Both fused grad-fn factories accept the decay kwarg; scale=0
    reproduces the near-zero-noise gradients on the same key stream."""
    import dataclasses

    from tinynerf_tpu.kernels.fused_train import make_fused_grad_fn

    cfg = TinyNeRFConfig(
        in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32
    )
    s = TrainSettings(
        n_rand=32, n_samples=16, num_freqs=4, model_cfg=cfg,
        sigma_noise_std=1.0,
    )
    params, _ = init_train_state(jax.random.PRNGKey(0), s)
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(32, 3).astype(np.float32) * 0.1)
    rd = rng.randn(32, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(32, 3).astype(np.float32))
    key = jax.random.PRNGKey(7)

    gfn = make_fused_grad_fn(s, tile_r=32, interpret=True)
    g0, m0 = gfn(params, ro, rd, target, key, noise_scale=0.0)
    gfn_tiny = make_fused_grad_fn(
        dataclasses.replace(s, sigma_noise_std=1e-30), tile_r=32,
        interpret=True,
    )
    g_ref, m_ref = gfn_tiny(params, ro, rd, target, key)
    np.testing.assert_allclose(
        float(m0["loss"]), float(m_ref["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_train_block_with_noise_decay_runs():
    """e2e: a scan block with decay configured compiles and trains
    (kwargs threaded through _step_body for both loss and grad_fn)."""
    from tinynerf_tpu.training import make_train_block

    cfg = TinyNeRFConfig(
        in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32
    )
    s = TrainSettings(
        n_rand=16, n_samples=8, num_freqs=4, model_cfg=cfg,
        sigma_noise_std=1.0, sigma_noise_decay_steps=2,
        ray_sampling="pool",
    )
    params, opt_state = init_train_state(jax.random.PRNGKey(0), s)
    rng = np.random.RandomState(0)
    n_img, hw = 2, 64
    ro = jnp.asarray(rng.randn(n_img, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_img, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    px = jnp.asarray(rng.rand(n_img, hw, 3).astype(np.float32))
    block = make_train_block(s, block_size=4)
    params, opt_state, metrics = block(
        params, opt_state, jax.random.PRNGKey(1), jnp.asarray(0, jnp.int32),
        ro, rd, px,
    )
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_config_threads_sigma_noise_decay():
    from tinynerf_tpu.config import Config

    assert Config().train_settings().sigma_noise_decay_steps == 0
    assert (
        Config(sigma_noise_decay_steps=2000)
        .train_settings()
        .sigma_noise_decay_steps
        == 2000
    )
