"""End-to-end training-core tests: loss decreases, scan block == loop,
determinism under refactoring of step batching."""

import jax
import jax.numpy as jnp
import numpy as np

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
