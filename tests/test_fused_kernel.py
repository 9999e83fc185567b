"""Parity tests: fused Pallas kernel (interpret mode on CPU) vs the
unfused jnp pipeline. The compiled-TPU path is exercised by bench.py
and the drivers with --fused."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.kernels.fused_render import _encode_permutation, fused_render_rays
from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.render import render_rays
from tinynerf_tpu.training import TrainSettings, init_train_state


def _rays(n, seed=0):
    rng = np.random.RandomState(seed)
    ro = (rng.randn(n, 3) * 0.1).astype(np.float32)
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_encode_permutation_roundtrip():
    """Permuted encoding == kernel's k-major layout."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    L = 10
    model_feats = positional_encoding(x, num_freqs=L)
    perm = _encode_permutation(L)
    permuted = np.asarray(model_feats)[:, perm]
    # Kernel layout built directly: [x, sin(k-major), cos(k-major)].
    bands = 2.0 ** np.arange(L, dtype=np.float32)
    theta = (np.asarray(x)[:, None, :] * bands[:, None]).reshape(5, -1)  # k-major
    want = np.concatenate([np.asarray(x), np.sin(theta), np.cos(theta)], axis=1)
    np.testing.assert_allclose(permuted, want, atol=1e-6)


def test_fused_matches_unfused_fp32():
    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    settings = TrainSettings(model_cfg=cfg)
    params, _ = init_train_state(jax.random.PRNGKey(0), settings)
    ro, rd = _rays(100)  # non-multiple of tile_r: exercises padding
    for wb in (True, False):
        want = render_rays(
            params, ro, rd, n_samples=64, model_cfg=cfg, white_bkgd=wb
        )
        got = fused_render_rays(
            params, ro, rd, n_samples=64, model_cfg=cfg, white_bkgd=wb,
            interpret=True,
        )
        assert got.shape == (100, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_fused_matches_unfused_bf16():
    cfg = TinyNeRFConfig(compute_dtype=jnp.bfloat16)
    settings = TrainSettings(model_cfg=cfg)
    params, _ = init_train_state(jax.random.PRNGKey(1), settings)
    ro, rd = _rays(64, seed=2)
    want = render_rays(params, ro, rd, n_samples=64, model_cfg=cfg)
    got = fused_render_rays(params, ro, rd, n_samples=64, model_cfg=cfg, interpret=True)
    # bf16 rounding points differ between the fused/unfused layouts.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.03)


def test_fused_small_model_and_odd_samples():
    """Non-default architecture: hidden=32, L=4, S=16, tile padding."""
    from tinynerf_tpu.ops.encoding import encoding_dim

    cfg = TinyNeRFConfig(in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32)
    settings = TrainSettings(num_freqs=4, n_samples=16, model_cfg=cfg)
    params, _ = init_train_state(jax.random.PRNGKey(3), settings)
    ro, rd = _rays(37, seed=4)
    want = render_rays(
        params, ro, rd, n_samples=16, num_freqs=4, model_cfg=cfg
    )
    got = fused_render_rays(
        params, ro, rd, n_samples=16, num_freqs=4, model_cfg=cfg,
        tile_r=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_fused_through_render_image():
    """use_fused=True plumbs through the chunked image renderer."""
    from tinynerf_tpu.render import render_image_fn

    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(0), TrainSettings(model_cfg=cfg))
    pose = jnp.eye(4).at[2, 3].set(4.0)
    kwargs = dict(H=10, W=10, focal=12.0, chunk=64, n_samples=32, model_cfg=cfg)
    a = render_image_fn(params, pose, use_fused=False, **kwargs)
    b = render_image_fn(params, pose, use_fused=True, **kwargs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
