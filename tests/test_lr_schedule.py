"""LR decay schedule: default is reference-parity constant lr."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.encoding import encoding_dim
from tinynerf_tpu.training import (
    TrainSettings,
    init_train_state,
    make_train_block,
    make_optimizer,
)

CFG = TinyNeRFConfig(in_dim=encoding_dim(3), hidden=8, compute_dtype=jnp.float32)


def test_default_is_constant_lr():
    """Two steps with/without lr_decay_steps=0 use identical updates."""
    opt = make_optimizer(5e-4)
    opt2 = make_optimizer(5e-4, decay_steps=0)
    p = {"w": jnp.ones(4)}
    g = {"w": jnp.full(4, 0.5)}
    s1 = opt.init(p)
    s2 = opt2.init(p)
    u1, _ = opt.update(g, s1, p)
    u2, _ = opt2.update(g, s2, p)
    np.testing.assert_array_equal(np.asarray(u1["w"]), np.asarray(u2["w"]))


def test_decay_reduces_effective_lr():
    """With decay, late-step updates are smaller than early ones."""
    opt = make_optimizer(1e-2, decay_steps=100, decay_factor=0.01)
    p = {"w": jnp.ones(4)}
    g = {"w": jnp.full(4, 0.5)}
    state = opt.init(p)
    first = None
    for i in range(200):
        u, state = opt.update(g, state, p)
        if i == 0:
            first = float(np.abs(np.asarray(u["w"])).max())
    last = float(np.abs(np.asarray(u["w"])).max())
    assert last < first * 0.1, (first, last)


def test_training_runs_with_decay():
    s = TrainSettings(
        n_rand=32, n_samples=8, num_freqs=3, lr=5e-4,
        lr_decay_steps=50, model_cfg=CFG,
    )
    params, opt_state = init_train_state(jax.random.PRNGKey(0), s)
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32) * 0.1)
    data = (ro, ro, jnp.asarray(rng.rand(1, 64, 3).astype(np.float32)))
    block = make_train_block(s, 30)
    params, opt_state, m = block(
        params, opt_state, jax.random.PRNGKey(1), jnp.int32(0), *data
    )
    assert np.isfinite(np.asarray(m["loss"])).all()
