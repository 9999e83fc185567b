"""Multi-scene batched training tests on the simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.multiscene import (
    init_multiscene_state,
    make_multiscene_train_block,
    scene_params,
)
from tinynerf_tpu.ops.encoding import encoding_dim
from tinynerf_tpu.parallel.mesh import make_mesh
from tinynerf_tpu.training import (
    TrainSettings,
    init_train_state,
    make_train_block,
)

SMALL = TrainSettings(
    n_rand=32,
    n_samples=8,
    num_freqs=3,
    lr=5e-4,
    model_cfg=TinyNeRFConfig(in_dim=encoding_dim(3), hidden=16, compute_dtype=jnp.float32),
)
K = 8


def _scenes(k=K, n_images=2, hw=25):
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(k, n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(k, n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    px = jnp.asarray(rng.rand(k, n_images, hw, 3).astype(np.float32))
    return ro, jnp.asarray(rd), px


def test_multiscene_runs_and_learns():
    data = _scenes()
    mesh = make_mesh()  # 8 devices, 1 scene each
    block = make_multiscene_train_block(SMALL, 30, K, mesh)
    params, opt_state = init_multiscene_state(jax.random.PRNGKey(0), K, SMALL)
    key = jax.random.PRNGKey(1)
    losses = []
    for b in range(3):
        params, opt_state, m = block(params, opt_state, key, jnp.int32(b * 30), *data)
        assert m["loss"].shape == (30, K)
        losses.append(np.asarray(m["loss"]).mean())
    assert losses[-1] < losses[0] * 0.95, losses


def test_multiscene_matches_independent_runs():
    """Batched K-scene run == K independent single-scene runs with the
    scene-folded keys (exact RNG + update equivalence)."""
    data = _scenes(k=4)
    mesh4 = make_mesh(n_devices=4)
    block = make_multiscene_train_block(SMALL, 5, 4, mesh4)
    params, opt_state = init_multiscene_state(jax.random.PRNGKey(0), 4, SMALL)
    key = jax.random.PRNGKey(7)
    params, opt_state, m = block(params, opt_state, key, jnp.int32(0), *data)

    single_block = make_train_block(SMALL, 5)
    init_keys = jax.random.split(jax.random.PRNGKey(0), 4)
    for k in range(4):
        from tinynerf_tpu.models.tinynerf import init_tinynerf
        from tinynerf_tpu.training import make_optimizer

        p1 = init_tinynerf(init_keys[k], SMALL.model_cfg)
        o1 = make_optimizer(SMALL.lr).init(p1)
        p1, o1, m1 = single_block(
            p1,
            o1,
            jax.random.fold_in(key, k),
            jnp.int32(0),
            data[0][k],
            data[1][k],
            data[2][k],
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(scene_params(params, k)),
            jax.tree_util.tree_leaves(p1),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m["loss"][:, k]), np.asarray(m1["loss"]), atol=1e-6
        )


def test_multiscene_divisibility_check():
    try:
        make_multiscene_train_block(SMALL, 2, 3, make_mesh())  # 3 % 8 != 0
        assert False
    except ValueError:
        pass
