"""End-to-end training-core tests: loss decreases, scan block == loop,
determinism under refactoring of step batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.encoding import encoding_dim
from tinynerf_tpu.training import (
    TrainSettings,
    init_train_state,
    make_train_block,
    make_train_step,
)

SMALL = TrainSettings(
    n_rand=64,
    n_samples=8,
    num_freqs=4,
    lr=5e-4,
    model_cfg=TinyNeRFConfig(in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32),
)


def _tiny_dataset(n_images=3, hw=25):
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(rng.randn(n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rays_d = jnp.asarray(rd)
    pixels = jnp.asarray(rng.rand(n_images, hw, 3).astype(np.float32))
    return rays_o, rays_d, pixels


def test_single_step_runs_and_is_finite():
    params, opt_state = init_train_state(jax.random.PRNGKey(0), SMALL)
    step_fn = make_train_step(SMALL)
    data = _tiny_dataset()
    params, opt_state, m = step_fn(
        params, opt_state, jax.random.PRNGKey(1), jnp.int32(0), *data
    )
    assert np.isfinite(float(m["loss"]))
    assert 0 < float(m["psnr"]) < 60


def test_block_equals_sequential_steps():
    """lax.scan block of K steps == K individual jitted steps."""
    data = _tiny_dataset()
    key = jax.random.PRNGKey(7)

    p1, o1 = init_train_state(jax.random.PRNGKey(0), SMALL)
    step_fn = make_train_step(SMALL)
    for s in range(4):
        p1, o1, m1 = step_fn(p1, o1, key, jnp.int32(s), *data)

    p2, o2 = init_train_state(jax.random.PRNGKey(0), SMALL)
    block_fn = make_train_block(SMALL, 4)
    p2, o2, m2 = block_fn(p2, o2, key, jnp.int32(0), *data)

    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"][-1]), atol=1e-6)


def test_loss_decreases_on_fixed_scene():
    """200 steps on a 3-image toy scene must reduce loss substantially."""
    data = _tiny_dataset()
    params, opt_state = init_train_state(jax.random.PRNGKey(0), SMALL)
    block_fn = make_train_block(SMALL, 50)
    key = jax.random.PRNGKey(0)
    losses = []
    for b in range(4):
        params, opt_state, m = block_fn(
            params, opt_state, key, jnp.int32(b * 50), *data
        )
        losses.append(float(m["loss"].mean()))
    assert losses[-1] < losses[0] * 0.9, losses


def test_step_reproducible_from_key_and_step():
    """Same (key, step) -> identical update (resume determinism)."""
    data = _tiny_dataset()
    key = jax.random.PRNGKey(5)
    step_fn = make_train_step(SMALL)
    outs = []
    for _ in range(2):
        p, o = init_train_state(jax.random.PRNGKey(0), SMALL)
        p, o, m = step_fn(p, o, key, jnp.int32(123), *data)
        outs.append(float(m["loss"]))
    assert outs[0] == outs[1]


class TestEmaParams:
    """Polyak averaging inside opt_state (--ema-decay)."""

    def test_ema_tracks_params(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from tinynerf_tpu.training import (
            ema_of_params,
            ema_params_from_opt_state,
            make_optimizer,
        )

        opt = make_optimizer(0.1, ema_decay=0.5)
        params = {"w": jnp.zeros((4,))}
        state = opt.init(params)
        assert ema_params_from_opt_state(state) is not None
        # One step with gradient -1 -> adam moves params to ~ +0.1;
        # ema = 0.5*0 + 0.5*new_params.
        g = {"w": -jnp.ones((4,))}
        updates, state = opt.update(g, state, params)
        new_params = optax.apply_updates(params, updates)
        ema = ema_params_from_opt_state(state)
        np.testing.assert_allclose(
            np.asarray(ema["w"]), 0.5 * np.asarray(new_params["w"]), rtol=1e-6
        )

    def test_no_ema_by_default(self):
        import jax.numpy as jnp

        from tinynerf_tpu.training import ema_params_from_opt_state, make_optimizer

        opt = make_optimizer(0.1)
        state = opt.init({"w": jnp.zeros((2,))})
        assert ema_params_from_opt_state(state) is None

    def test_ema_composes_with_weight_decay_and_schedule(self):
        import jax.numpy as jnp

        from tinynerf_tpu.training import ema_params_from_opt_state, make_optimizer

        opt = make_optimizer(
            1e-3, decay_steps=10, weight_decay=1e-4, lr_floor=1e-5, ema_decay=0.9
        )
        params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
        state = opt.init(params)
        g = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
        _, state = opt.update(g, state, params)
        assert ema_params_from_opt_state(state) is not None


class TestSparsityPrior:
    """Free-space density prior (ops/regularizers.py)."""

    def test_grads_structure_and_direction_tinynerf(self):
        import jax
        import jax.numpy as jnp

        from tinynerf_tpu.models.tinynerf import TinyNeRFConfig, init_tinynerf
        from tinynerf_tpu.ops.encoding import encoding_dim
        from tinynerf_tpu.ops.regularizers import make_sparsity_grad_fn
        from tinynerf_tpu.training import TrainSettings

        mcfg = TinyNeRFConfig(
            in_dim=encoding_dim(4), hidden=16, compute_dtype=jnp.float32
        )
        s = TrainSettings(num_freqs=4, model_cfg=mcfg)
        params = init_tinynerf(jax.random.PRNGKey(0), mcfg)
        fn = make_sparsity_grad_fn(s, "tinynerf", lam=1e-2, n_points=256)
        g = fn(params, jax.random.PRNGKey(1))
        # Same structure as params, finite, and nonzero somewhere on
        # the sigma path.
        assert jax.tree_util.tree_structure(g) == jax.tree_util.tree_structure(
            params
        )
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(x).all()) for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
        # rgb head receives NO gradient from a sigma-only loss.
        assert float(jnp.abs(g["rgb"]["w"]).max()) == 0.0

    def test_prior_reduces_mean_sigma_nerf(self):
        """A few prior-only update steps push mean density down on the
        {'coarse','fine'} pytree."""
        import jax
        import jax.numpy as jnp
        import optax

        from tinynerf_tpu.models.nerf import NeRFConfig, apply_nerf_mlp, init_nerf
        from tinynerf_tpu.ops.encoding import positional_encoding
        from tinynerf_tpu.ops.regularizers import make_sparsity_grad_fn
        from tinynerf_tpu.training import TrainSettings

        ncfg = NeRFConfig(
            num_freqs=4, num_freqs_dir=2, hidden=16, depth=3, skip_at=2,
            rgb_hidden=8, compute_dtype=jnp.float32,
        )
        s = TrainSettings(num_freqs=4)
        params = init_nerf(jax.random.PRNGKey(3), ncfg)
        fn = make_sparsity_grad_fn(s, "nerf", nerf_cfg=ncfg, lam=1.0, n_points=512)
        opt = optax.sgd(1e-2)
        state = opt.init(params)

        def mean_sig(p):
            pts = jax.random.uniform(
                jax.random.PRNGKey(9), (512, 3), minval=-3, maxval=3
            )
            x = positional_encoding(pts, num_freqs=4)
            d = positional_encoding(jnp.ones((512, 3)) / jnp.sqrt(3.0), num_freqs=2)
            return float(
                apply_nerf_mlp(p["fine"], x, d, ncfg)[1].mean()
                + apply_nerf_mlp(p["coarse"], x, d, ncfg)[1].mean()
            )

        before = mean_sig(params)
        for i in range(5):
            g = fn(params, jax.random.PRNGKey(i))
            upd, state = opt.update(g, state, params)
            params = optax.apply_updates(params, upd)
        after = mean_sig(params)
        assert after < before, (before, after)


class TestSigmaDeathDetector:
    def test_background_psnr(self):
        from tinynerf_tpu.training import background_psnr

        # Half the pixels white, half black: mse vs white = 0.5.
        pix = jnp.concatenate(
            [jnp.ones((2, 8, 3)), jnp.zeros((2, 8, 3))], axis=1
        )
        bp = background_psnr(pix, white_bkgd=True)
        assert abs(bp - (-10 * np.log10(0.5))) < 1e-4

    def test_detector_triggers_on_pinned_psnr(self):
        from tinynerf_tpu.training import SigmaDeathDetector

        det = SigmaDeathDetector(11.5, margin=1.0, window=3, grace=100)
        # Grace period: pinned values before step 100 don't count.
        assert not det.update(50, 11.4)
        # Pinned for `window` consecutive log points after grace -> dead.
        assert not det.update(100, 11.6)
        assert not det.update(150, 11.3)
        assert det.update(200, 12.0)  # third consecutive pinned point
        assert det.first_pinned_step == 100

    def test_detector_resets_on_recovery(self):
        from tinynerf_tpu.training import SigmaDeathDetector

        det = SigmaDeathDetector(11.5, margin=1.0, window=2, grace=0)
        assert not det.update(50, 11.4)
        assert not det.update(100, 15.0)  # learning: reset
        assert det.first_pinned_step is None
        assert not det.update(150, 11.4)
        assert det.update(200, 11.4)

    def test_detector_disabled_on_all_background_capture(self):
        from tinynerf_tpu.training import (
            SigmaDeathDetector,
            background_psnr,
        )

        bp = background_psnr(jnp.ones((2, 8, 3)), white_bkgd=True)  # ~100 dB
        det = SigmaDeathDetector(bp, window=1, grace=0)
        assert not det.enabled
        assert not det.update(1000, 50.0)


class TestPrecrop:
    def _rays(self, n_images=2, H=8, W=8):
        hw = H * W
        # Encode the pixel index in channel 0 so drawn indices are
        # recoverable from the returned ray origins.
        idx = jnp.tile(jnp.arange(hw, dtype=jnp.float32)[None, :], (n_images, 1))
        ro = jnp.stack([idx, jnp.zeros_like(idx), jnp.zeros_like(idx)], -1)
        return ro, ro, jnp.zeros((n_images, hw, 3))

    def _center_set(self, H=8, W=8, frac=0.5):
        ch, cw = int(H * frac), int(W * frac)
        rlo, clo = (H - ch) // 2, (W - cw) // 2
        return {
            (rlo + r) * W + (clo + c) for r in range(ch) for c in range(cw)
        }

    def test_image_mode_precrop_window(self):
        from tinynerf_tpu.training import TrainSettings, draw_ray_batch

        s = TrainSettings(
            n_rand=256, precrop_iters=10, precrop_frac=0.5, image_hw=(8, 8)
        )
        ro, rd, px = self._rays()
        center = self._center_set()
        # During warmup: every drawn pixel lies in the central window.
        got, _, _, _ = draw_ray_batch(s, jax.random.PRNGKey(0), 0, ro, rd, px)
        drawn = set(np.asarray(got[:, 0]).astype(int).tolist())
        assert drawn <= center, drawn - center
        # After warmup: the full image is reachable again.
        got, _, _, _ = draw_ray_batch(s, jax.random.PRNGKey(0), 10, ro, rd, px)
        drawn = set(np.asarray(got[:, 0]).astype(int).tolist())
        assert not (drawn <= center)

    def test_pool_mode_precrop_window(self):
        from tinynerf_tpu.training import TrainSettings, draw_ray_batch

        s = TrainSettings(
            n_rand=256, ray_sampling="pool", precrop_iters=10,
            precrop_frac=0.5, image_hw=(8, 8),
        )
        ro, rd, px = self._rays()
        center = self._center_set()
        got, _, _, _ = draw_ray_batch(s, jax.random.PRNGKey(0), 0, ro, rd, px)
        drawn = set(np.asarray(got[:, 0]).astype(int).tolist())
        assert drawn <= center, drawn - center
        got, _, _, _ = draw_ray_batch(s, jax.random.PRNGKey(0), 11, ro, rd, px)
        drawn = set(np.asarray(got[:, 0]).astype(int).tolist())
        assert not (drawn <= center)

    def test_precrop_requires_image_hw(self):
        from tinynerf_tpu.training import TrainSettings, draw_ray_batch

        s = TrainSettings(n_rand=8, precrop_iters=10)
        ro, rd, px = self._rays()
        with pytest.raises(ValueError, match="image_hw"):
            draw_ray_batch(s, jax.random.PRNGKey(0), 0, ro, rd, px)

    def test_precrop_off_stream_unchanged(self):
        """precrop_iters=0 must not perturb the historical RNG stream."""
        from tinynerf_tpu.training import TrainSettings, draw_ray_batch

        ro, rd, px = self._rays()
        a = draw_ray_batch(
            TrainSettings(n_rand=32), jax.random.PRNGKey(0), 3, ro, rd, px
        )
        b = draw_ray_batch(
            TrainSettings(n_rand=32, precrop_frac=0.25),
            jax.random.PRNGKey(0), 3, ro, rd, px,
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
