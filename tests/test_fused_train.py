"""Fused train kernel: gradient parity with jax.grad (interpret mode).

Parity is asserted on the deterministic-depth path (randomized=False),
where the fused kernel and jax.grad see identical z-values. The
jittered path uses the in-kernel TPU PRNG (different stream than
jax.random, same stratified bins) and is validated by bin-containment
+ training-learns tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.kernels.fused_train import fused_loss_grads, make_fused_grad_fn
from tinynerf_tpu.models.tinynerf import TinyNeRFConfig, apply_tinynerf
from tinynerf_tpu.ops.encoding import encoding_dim, positional_encoding
from tinynerf_tpu.ops.sampling import stratified_samples
from tinynerf_tpu.ops.volume import volume_render
from tinynerf_tpu.training import TrainSettings, init_train_state


def _case(R=64, S=16, L=4, hidden=32, seed=0):
    cfg = TinyNeRFConfig(in_dim=encoding_dim(L), hidden=hidden, compute_dtype=jnp.float32)
    s = TrainSettings(n_rand=R, n_samples=S, num_freqs=L, model_cfg=cfg)
    params, _ = init_train_state(jax.random.PRNGKey(seed), s)
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    return s, cfg, params, ro, rd, target


def _ref_loss(params, ro, rd, target, s, white_bkgd=True):
    """Unfused deterministic-z training loss."""
    z, pts = stratified_samples(s.near, s.far, s.n_samples, ro, rd, randomized=False)
    xenc = positional_encoding(pts.reshape(-1, 3), num_freqs=s.num_freqs)
    rgb, sigma = apply_tinynerf(params, xenc, s.model_cfg)
    R = ro.shape[0]
    comp, _, _, _ = volume_render(
        rgb.reshape(R, s.n_samples, 3),
        sigma.reshape(R, s.n_samples),
        z,
        rd,
        white_bkgd=white_bkgd,
    )
    return jnp.mean((comp - target) ** 2)


def _assert_grads_close(ref_grads, grads):
    flat_ref, tree_ref = jax.tree_util.tree_flatten(ref_grads)
    flat_got, tree_got = jax.tree_util.tree_flatten(grads)
    assert str(tree_ref) == str(tree_got)
    for a, b in zip(flat_ref, flat_got):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4 * scale + 1e-8
        )


def test_grads_match_jax_grad_deterministic():
    s, cfg, params, ro, rd, target = _case()
    for wb in (True, False):
        ref_loss, ref_grads = jax.value_and_grad(
            lambda p: _ref_loss(p, ro, rd, target, s, white_bkgd=wb)
        )(params)
        loss, grads = fused_loss_grads(
            params, ro, rd, target, 0,
            n_samples=s.n_samples, randomized=False, num_freqs=s.num_freqs,
            white_bkgd=wb, model_cfg=cfg, tile_r=32, interpret=True,
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
        _assert_grads_close(ref_grads, grads)


def test_grads_match_nondefault_arch():
    """depth=3, skip_at=1, hidden=48 exercises the generic loops."""
    L = 3
    cfg = TinyNeRFConfig(
        in_dim=encoding_dim(L), hidden=48, depth=3, skip_at=1,
        compute_dtype=jnp.float32,
    )
    s = TrainSettings(n_rand=32, n_samples=8, num_freqs=L, model_cfg=cfg)
    params, _ = init_train_state(jax.random.PRNGKey(2), s)
    rng = np.random.RandomState(2)
    ro = jnp.asarray(rng.randn(32, 3).astype(np.float32) * 0.1)
    rd = rng.randn(32, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    target = jnp.asarray(rng.rand(32, 3).astype(np.float32))
    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: _ref_loss(p, ro, rd, target, s)
    )(params)
    loss, grads = fused_loss_grads(
        params, ro, rd, target, 0,
        n_samples=8, randomized=False, num_freqs=L, model_cfg=cfg,
        tile_r=32, interpret=True,
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
    _assert_grads_close(ref_grads, grads)


def test_fused_training_learns():
    """Short training run through make_train_block(grad_fn=fused).

    Deterministic depths here: the pltpu PRNG primitives don't lower in
    interpret mode under jit+scan; the jittered path is exercised on
    real TPU by the --fused-train driver flag and bench.py.
    """
    from tinynerf_tpu.training import make_train_block

    s, cfg, params, ro, rd, target = _case(R=64, S=8)
    grad_fn = make_fused_grad_fn(s, tile_r=32, randomized=False, interpret=True)
    block = make_train_block(s, 20, grad_fn=grad_fn)
    params, opt_state = init_train_state(jax.random.PRNGKey(0), s)
    data = (ro[None], rd[None], target[None])  # one "image" of 64 rays
    key = jax.random.PRNGKey(1)
    losses = []
    for b in range(3):
        params, opt_state, m = block(params, opt_state, key, jnp.int32(b * 20), *data)
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
