"""Golden-image regression: a fixed-seed render must stay pixel-stable.

Pins the entire deterministic pipeline (init -> rays -> sampling ->
encoding -> MLP -> composite -> chunked image assembly) against silent
numeric drift. The fixture was generated on CPU in f32
(tests/golden_render_16x16.npy); regenerate ONLY for intentional
behavioral changes, and note why in the commit.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.render import render_image_fn
from tinynerf_tpu.training import TrainSettings, init_train_state

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_render_16x16.npy")


def _render(use_fused=False):
    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(42), TrainSettings(model_cfg=cfg))
    pose = jnp.eye(4).at[2, 3].set(4.0)
    return np.asarray(
        render_image_fn(
            params, pose, H=16, W=16, focal=20.0, chunk=64,
            n_samples=32, model_cfg=cfg, use_fused=use_fused,
        )
    )


def test_render_matches_golden():
    want = np.load(GOLDEN)
    got = _render()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_kernel_matches_golden():
    want = np.load(GOLDEN)
    got = _render(use_fused=True)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_frames_renderer_matches_per_pose():
    """The batched pose-path renderer (one dispatch for all frames,
    make_gif's path) must produce exactly the per-pose renderer's
    images."""
    from tinynerf_tpu.ops.camera import spiral_poses
    from tinynerf_tpu.render import make_image_renderer

    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(42), TrainSettings(model_cfg=cfg))
    kw = dict(H=16, W=16, focal=20.0, chunk=64, n_samples=32, model_cfg=cfg)
    poses = spiral_poses(jnp.eye(4).at[2, 3].set(4.0), n_frames=4, radius=0.3)
    batched = np.asarray(make_image_renderer(frames=True, **kw)(params, poses))
    single = make_image_renderer(**kw)
    assert batched.shape == (4, 16, 16, 3)
    for i in range(4):
        np.testing.assert_allclose(
            batched[i], np.asarray(single(params, poses[i])), atol=1e-6
        )


def test_frames_renderer_fused_path_matches():
    """frames=True composed with the fused Pallas kernel (make_gif's
    TPU configuration) must match the unfused batched render."""
    from tinynerf_tpu.ops.camera import spiral_poses
    from tinynerf_tpu.render import make_image_renderer

    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(42), TrainSettings(model_cfg=cfg))
    kw = dict(H=16, W=16, focal=20.0, chunk=128, n_samples=32, model_cfg=cfg)
    poses = spiral_poses(jnp.eye(4).at[2, 3].set(4.0), n_frames=2, radius=0.3)
    plain = np.asarray(make_image_renderer(frames=True, **kw)(params, poses))
    fused = np.asarray(
        make_image_renderer(frames=True, use_fused=True, **kw)(params, poses)
    )
    np.testing.assert_allclose(fused, plain, atol=5e-4)


def test_hierarchical_frames_renderer_matches_per_pose():
    """Same contract for the full-NeRF (coarse/fine) renderer."""
    from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf
    from tinynerf_tpu.ops.camera import spiral_poses
    from tinynerf_tpu.render import make_hierarchical_image_renderer

    ncfg = NeRFConfig(hidden=32, depth=3, compute_dtype=jnp.float32)
    params = init_nerf(jax.random.PRNGKey(7), ncfg)
    kw = dict(
        H=8, W=8, focal=10.0, chunk=32, n_coarse=16, n_fine=16, nerf_cfg=ncfg
    )
    poses = spiral_poses(jnp.eye(4).at[2, 3].set(4.0), n_frames=3, radius=0.3)
    batched = np.asarray(
        make_hierarchical_image_renderer(frames=True, **kw)(params, poses)
    )
    single = make_hierarchical_image_renderer(**kw)
    assert batched.shape == (3, 8, 8, 3)
    for i in range(3):
        np.testing.assert_allclose(
            batched[i], np.asarray(single(params, poses[i])), atol=1e-6
        )


def test_chunk_size_invariance():
    """Chunking must not change pixels (reference guarantee)."""
    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(42), TrainSettings(model_cfg=cfg))
    pose = jnp.eye(4).at[2, 3].set(4.0)
    imgs = [
        np.asarray(
            render_image_fn(
                params, pose, H=16, W=16, focal=20.0, chunk=c,
                n_samples=32, model_cfg=cfg,
            )
        )
        for c in (32, 64, 256)
    ]
    np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-6)
    np.testing.assert_allclose(imgs[1], imgs[2], atol=1e-6)
