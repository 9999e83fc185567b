"""Tests for the TinyNeRF MLP (parity with src/nerf.py:10-41)."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.models.tinynerf import (
    TinyNeRFConfig,
    apply_tinynerf,
    count_params,
    init_tinynerf,
)


def test_param_count_66308():
    """Default config matches the reference's 66,308 parameters
    (verified against tiny_nerf_min.py:593's printed count)."""
    params = init_tinynerf(jax.random.PRNGKey(0))
    assert count_params(params) == 66308


def test_layer_widths_with_skip():
    cfg = TinyNeRFConfig()
    params = init_tinynerf(jax.random.PRNGKey(0), cfg)
    shapes = [tuple(l["w"].shape) for l in params["layers"]]
    assert shapes == [(63, 128), (128, 128), (191, 128), (128, 128)]
    assert params["sigma"]["w"].shape == (128, 1)
    assert params["rgb"]["w"].shape == (128, 3)


def test_output_ranges(rng):
    """rgb in (0,1) via sigmoid; sigma >= 0 via ReLU (src/nerf.py:26-27)."""
    params = init_tinynerf(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(256, 63).astype(np.float32))
    rgb, sigma = apply_tinynerf(params, x)
    rgb, sigma = np.asarray(rgb), np.asarray(sigma)
    assert rgb.shape == (256, 3) and sigma.shape == (256, 1)
    assert (rgb > 0).all() and (rgb < 1).all()
    assert (sigma >= 0).all()


def test_skip_connection_matters(rng):
    """Zeroing trunk weights after the skip still lets x reach layer 2."""
    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params = init_tinynerf(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(8, 63).astype(np.float32))
    # Kill layers 0/1 weights+biases -> h before skip is relu(0)=0, so
    # the input to layer 2 is [0(128), x(63)]; output must depend on x.
    for i in (0, 1):
        params["layers"][i]["w"] = jnp.zeros_like(params["layers"][i]["w"])
        params["layers"][i]["b"] = jnp.zeros_like(params["layers"][i]["b"])
    rgb1, _ = apply_tinynerf(params, x, cfg)
    rgb2, _ = apply_tinynerf(params, x * 2.0, cfg)
    assert np.abs(np.asarray(rgb1) - np.asarray(rgb2)).max() > 1e-6


def test_manual_forward_parity(rng):
    """fp32 apply matches a hand-rolled numpy forward pass."""
    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params = init_tinynerf(jax.random.PRNGKey(3), cfg)
    x = rng.randn(16, 63).astype(np.float32)

    def np_relu(a):
        return np.maximum(a, 0)

    p = jax.tree_util.tree_map(np.asarray, params)
    h = x
    for i in range(4):
        h = np_relu(h @ p["layers"][i]["w"] + p["layers"][i]["b"])
        if i == 1:
            h = np.concatenate([h, x], axis=-1)
    rgb_np = 1 / (1 + np.exp(-(h @ p["rgb"]["w"] + p["rgb"]["b"])))
    sigma_np = np_relu(h @ p["sigma"]["w"] + p["sigma"]["b"])
    rgb, sigma = apply_tinynerf(params, jnp.asarray(x), cfg)
    # XLA reassociates the fp32 accumulations; allow summation-order noise.
    np.testing.assert_allclose(np.asarray(rgb), rgb_np, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sigma), sigma_np, atol=5e-4)


def test_bf16_close_to_fp32(rng):
    params = init_tinynerf(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(64, 63).astype(np.float32))
    rgb32, sig32 = apply_tinynerf(params, x, TinyNeRFConfig(compute_dtype=jnp.float32))
    rgb16, sig16 = apply_tinynerf(params, x, TinyNeRFConfig(compute_dtype=jnp.bfloat16))
    assert np.abs(np.asarray(rgb32) - np.asarray(rgb16)).max() < 0.05


def test_init_scale_matches_torch_linear_family():
    """Weights uniform within +-1/sqrt(fan_in)."""
    params = init_tinynerf(jax.random.PRNGKey(0))
    w0 = np.asarray(params["layers"][0]["w"])
    bound = 1.0 / np.sqrt(63)
    assert np.abs(w0).max() <= bound + 1e-6
    assert np.abs(w0).max() > 0.8 * bound  # actually fills the range
