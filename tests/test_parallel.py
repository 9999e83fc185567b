"""Sharded training/rendering tests on the CPU-simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.encoding import encoding_dim
from tinynerf_tpu.parallel.mesh import make_mesh, mesh_axes
from tinynerf_tpu.parallel.render import make_sharded_image_renderer
from tinynerf_tpu.parallel.train import make_sharded_train_block
from tinynerf_tpu.render import make_image_renderer
from tinynerf_tpu.training import TrainSettings, init_train_state

SMALL = TrainSettings(
    n_rand=128,
    n_samples=16,
    num_freqs=4,
    lr=5e-4,
    model_cfg=TinyNeRFConfig(in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32),
)


def _tiny_dataset(n_images=3, hw=64):
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(rng.randn(n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return rays_o, jnp.asarray(rd), jnp.asarray(rng.rand(n_images, hw, 3).astype(np.float32))


def test_mesh_shapes():
    m1 = make_mesh()
    assert mesh_axes(m1) == (8, 1)
    m2 = make_mesh(sample_parallel=2)
    assert mesh_axes(m2) == (4, 2)
    m3 = make_mesh(n_devices=4, sample_parallel=4)
    assert mesh_axes(m3) == (1, 4)


def test_dp_train_block_runs_and_learns():
    data = _tiny_dataset()
    mesh = make_mesh()  # 8-way data parallel
    block = make_sharded_train_block(SMALL, 25, mesh)
    params, opt_state = init_train_state(jax.random.PRNGKey(0), SMALL)
    key = jax.random.PRNGKey(1)
    losses = []
    for b in range(4):
        params, opt_state, m = block(
            params, opt_state, key, jnp.int32(b * 25), *data
        )
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.95, losses


def test_dp_sp_2d_mesh_matches_dp_gradient_path():
    """('data','sample') mesh must produce finite, decreasing loss and
    params that stay replicated-consistent."""
    data = _tiny_dataset()
    mesh = make_mesh(sample_parallel=4)  # 2 x 4 mesh
    block = make_sharded_train_block(SMALL, 25, mesh)
    params, opt_state = init_train_state(jax.random.PRNGKey(0), SMALL)
    key = jax.random.PRNGKey(1)
    losses = []
    for b in range(3):
        params, opt_state, m = block(params, opt_state, key, jnp.int32(b * 25), *data)
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_sp_gradients_match_unsharded():
    """One train step on a (1, 8) sample-sharded mesh == unsharded step.

    The data axis has size 1 so the RNG stream (fold_in data_idx=0 ==
    fold_in 0 != unsharded stream) — so instead compare two sharded
    meshes: (1,8) sample-parallel vs (1,1): identical ray draws,
    identical jitter, the only difference is the blockwise composite +
    psum gradient path.
    """
    data = _tiny_dataset()
    key = jax.random.PRNGKey(3)
    outs = []
    for sp in (1, 8):
        mesh = make_mesh(n_devices=sp, sample_parallel=sp)
        block = make_sharded_train_block(SMALL, 3, mesh)
        params, opt_state = init_train_state(jax.random.PRNGKey(0), SMALL)
        params, opt_state, m = block(params, opt_state, key, jnp.int32(0), *data)
        outs.append((jax.tree_util.tree_leaves(params), m["loss"]))
    for a, b in zip(outs[0][0], outs[1][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs[0][1]), np.asarray(outs[1][1]), atol=1e-6
    )


def test_dp_with_fused_grad_fn():
    """DP shard_map + the fused Pallas train kernel (interpret mode,
    deterministic depths) learns; per-device local batch 128/8 = 16...
    use n_rand=256 so each device's 32 rays tile at tile_r=32."""
    from tinynerf_tpu.kernels.fused_train import make_fused_grad_fn

    s = TrainSettings(
        n_rand=256,
        n_samples=16,
        num_freqs=4,
        lr=5e-4,
        model_cfg=TinyNeRFConfig(
            in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32
        ),
    )
    grad_fn = make_fused_grad_fn(s, tile_r=32, randomized=False, interpret=True)
    data = _tiny_dataset()
    mesh = make_mesh()
    block = make_sharded_train_block(s, 20, mesh, grad_fn=grad_fn)
    params, opt_state = init_train_state(jax.random.PRNGKey(0), s)
    key = jax.random.PRNGKey(1)
    losses = []
    for b in range(3):
        params, opt_state, m = block(params, opt_state, key, jnp.int32(b * 20), *data)
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_sharded_render_matches_single_device():
    mesh = make_mesh()
    cfg = TinyNeRFConfig(in_dim=encoding_dim(4), hidden=32, compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(0), SMALL)
    kwargs = dict(
        H=20, W=20, focal=25.0, chunk=64, n_samples=16, num_freqs=4, model_cfg=cfg
    )
    pose = jnp.eye(4).at[2, 3].set(4.0)
    img_single = make_image_renderer(**kwargs)(params, pose)
    img_sharded = make_sharded_image_renderer(mesh, **kwargs)(params, pose)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), atol=2e-5
    )


def test_sp_hierarchical_nerf_matches_unsharded():
    """Sharded hierarchical (coarse+fine) loss: one train block on a
    (1, 4) sample-sharded mesh == (1, 1) mesh exactly — same ray draws,
    same jitter/resample keys; the only difference is the blockwise
    composite + all_gather + pmean gradient path over the fine union."""
    from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf

    cfg = NeRFConfig(
        num_freqs=4, num_freqs_dir=2, hidden=32, depth=3, skip_at=2,
        rgb_hidden=16, compute_dtype=jnp.float32,
    )
    s = TrainSettings(n_rand=64, n_samples=16, num_freqs=4, lr=5e-4)
    data = _tiny_dataset()
    key = jax.random.PRNGKey(3)
    outs = []
    for sp in (1, 4):
        mesh = make_mesh(n_devices=sp, sample_parallel=sp)
        block = make_sharded_train_block(s, 3, mesh, nerf_cfg=cfg, n_fine=8)
        params, opt_state = init_train_state(
            jax.random.PRNGKey(0), s, init_fn=lambda k: init_nerf(k, cfg)
        )
        params, opt_state, m = block(params, opt_state, key, jnp.int32(0), *data)
        outs.append((jax.tree_util.tree_leaves(params), m["loss"]))
    for a, b in zip(outs[0][0], outs[1][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs[0][1]), np.asarray(outs[1][1]), atol=1e-6
    )


def test_dp_sp_hierarchical_nerf_learns():
    """Hierarchical NeRF on the full 2-D (2 data x 4 sample) mesh."""
    from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf

    cfg = NeRFConfig(
        num_freqs=4, num_freqs_dir=2, hidden=32, depth=3, skip_at=2,
        rgb_hidden=16, compute_dtype=jnp.float32,
    )
    s = TrainSettings(n_rand=64, n_samples=16, num_freqs=4, lr=5e-4)
    data = _tiny_dataset()
    mesh = make_mesh(sample_parallel=4)  # 2 x 4
    block = make_sharded_train_block(s, 20, mesh, nerf_cfg=cfg, n_fine=8)
    params, opt_state = init_train_state(
        jax.random.PRNGKey(0), s, init_fn=lambda k: init_nerf(k, cfg)
    )
    key = jax.random.PRNGKey(1)
    losses = []
    for b in range(3):
        params, opt_state, m = block(params, opt_state, key, jnp.int32(b * 20), *data)
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
