"""Block-partials fused kernels (kernels/fused_partials.py): exact
parity with ops/volume.composite_block_partials forward AND backward
(through gather+combine cotangents), and the fused sample-parallel
train block vs the XLA sharded loss on the CPU-simulated mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.kernels.fused_partials import make_fused_block_partials_fn
from tinynerf_tpu.models.nerf import NeRFConfig, apply_nerf_mlp, init_nerf_mlp
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.ops.volume import (
    combine_block_partials,
    composite_block_partials,
    global_deltas,
)

TINY = NeRFConfig(
    num_freqs=4, num_freqs_dir=2, hidden=32, depth=3, skip_at=2, rgb_hidden=16,
    compute_dtype=jnp.float32,
)


def _case(R=32, S=16, seed=0, noise_std=0.5):
    rng = np.random.RandomState(seed)
    mlp = init_nerf_mlp(jax.random.PRNGKey(seed), TINY)
    ro = jnp.asarray((rng.randn(R, 3) * 0.1).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    tgt = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(2, 6, (R, S)).astype(np.float32), axis=1))
    noise = jnp.asarray(rng.randn(R, S).astype(np.float32) * noise_std)
    return mlp, ro, rd, tgt, z, noise


def _xla_shard(mlp, ro, rd, z, deltas, noise, sl):
    """composite_block_partials over an XLA MLP on shard columns sl."""
    R = ro.shape[0]
    zb, db, nb = z[:, sl], deltas[:, sl], noise[:, sl]
    sh = zb.shape[1]
    pts = ro[:, None, :] + rd[:, None, :] * zb[..., None]
    x = positional_encoding(pts.reshape(-1, 3), num_freqs=TINY.num_freqs)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    de = jnp.repeat(
        positional_encoding(vd, num_freqs=TINY.num_freqs_dir), sh, axis=0
    )
    rgb, sig = apply_nerf_mlp(mlp, x, de, TINY, sigma_noise=nb.reshape(-1, 1))
    return composite_block_partials(
        rgb.reshape(R, sh, 3), sig.reshape(R, sh), zb, db, return_weights=True
    )


def _assert_tree_close(ref, got, rtol=3e-4):
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=rtol * scale + 1e-7
        )


@pytest.mark.parametrize("n_shards,tile_r,sb", [(2, 16, 4), (4, 32, 4), (1, 16, 8)])
def test_partials_forward_matches_xla_composite(n_shards, tile_r, sb):
    mlp, ro, rd, _, z, noise = _case()
    deltas = global_deltas(z, rd)
    sh = z.shape[1] // n_shards
    fn = make_fused_block_partials_fn(
        TINY, emit_weights=True, tile_r=tile_r, sample_block=sb, interpret=True
    )
    for b in range(n_shards):
        sl = slice(b * sh, (b + 1) * sh)
        pf, wf = fn(mlp, ro, rd, z[:, sl], deltas[:, sl], noise[:, sl])
        px, wx = _xla_shard(mlp, ro, rd, z, deltas, noise, sl)
        for k in px:
            np.testing.assert_allclose(
                np.asarray(pf[k]), np.asarray(px[k]), atol=1e-5,
                err_msg=f"shard {b} partial {k}",
            )
        np.testing.assert_allclose(np.asarray(wf), np.asarray(wx), atol=1e-5)


@pytest.mark.parametrize("emit_weights", [True, False])
def test_partials_grads_match_jax_grad_through_combine(emit_weights):
    """jax.grad through (kernel partials -> stack -> combine -> mse)
    equals the pure-XLA twin; emit_weights=True also routes a nonzero
    cotangent through the local-weights output (g_w path)."""
    mlp, ro, rd, tgt, z, noise = _case(seed=3)
    deltas = global_deltas(z, rd)
    n_shards, sh = 2, z.shape[1] // 2
    fn = make_fused_block_partials_fn(
        TINY, emit_weights=emit_weights, tile_r=16, sample_block=4,
        interpret=True,
    )

    def loss_with(shard_fn):
        def loss(mlp):
            parts, ws = [], []
            for b in range(n_shards):
                sl = slice(b * sh, (b + 1) * sh)
                out = shard_fn(mlp, sl)
                parts.append(out[0])
                ws.append(out[1])
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *parts)
            comp, _, _ = combine_block_partials(stacked, white_bkgd=True)
            total = jnp.mean((comp - tgt) ** 2)
            if emit_weights:  # exercise the g_w cotangent path
                total = total + 0.1 * sum(jnp.mean(w**2) for w in ws)
            return total
        return loss

    def fused_shard(mlp, sl):
        out = fn(mlp, ro, rd, z[:, sl], deltas[:, sl], noise[:, sl])
        return out if emit_weights else (out[0], None)

    def xla_shard(mlp, sl):
        return _xla_shard(mlp, ro, rd, z, deltas, noise, sl)

    lx, gx = jax.value_and_grad(loss_with(xla_shard))(mlp)
    lf, gf = jax.value_and_grad(loss_with(fused_shard))(mlp)
    np.testing.assert_allclose(float(lf), float(lx), atol=1e-6)
    _assert_tree_close(gx, gf)


def test_partials_no_viewdirs():
    import dataclasses

    cfg = dataclasses.replace(TINY, use_viewdirs=False)
    mlp = init_nerf_mlp(jax.random.PRNGKey(5), cfg)
    _, ro, rd, tgt, z, noise = _case(R=16, S=8, seed=5)
    deltas = global_deltas(z, rd)
    fn = make_fused_block_partials_fn(
        cfg, emit_weights=False, tile_r=16, sample_block=4, interpret=True
    )

    def fused_loss(mlp):
        p, _ = fn(mlp, ro, rd, z, deltas, noise)
        stacked = jax.tree_util.tree_map(lambda x: x[None], p)
        comp, _, _ = combine_block_partials(stacked)
        return jnp.mean((comp - tgt) ** 2)

    def xla_loss(mlp):
        R, S = z.shape
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        x = positional_encoding(pts.reshape(-1, 3), num_freqs=cfg.num_freqs)
        rgb, sig = apply_nerf_mlp(
            mlp, x, None, cfg, sigma_noise=noise.reshape(-1, 1)
        )
        p = composite_block_partials(
            rgb.reshape(R, S, 3), sig.reshape(R, S), z, deltas
        )
        stacked = jax.tree_util.tree_map(lambda x: x[None], p)
        comp, _, _ = combine_block_partials(stacked)
        return jnp.mean((comp - tgt) ** 2)

    lx, gx = jax.value_and_grad(xla_loss)(mlp)
    lf, gf = jax.value_and_grad(fused_loss)(mlp)
    np.testing.assert_allclose(float(lf), float(lx), atol=1e-6)
    _assert_tree_close(gx, gf)


def test_partials_shape_validation():
    mlp, ro, rd, _, z, noise = _case(R=24, S=8)
    deltas = global_deltas(z, rd)
    fn = make_fused_block_partials_fn(
        TINY, tile_r=16, sample_block=4, interpret=True
    )
    with pytest.raises(ValueError, match="tile_r"):
        fn(mlp, ro, rd, z, deltas, noise)


# ---------------------------------------------------------------------------
# Sample-parallel composition on the CPU-simulated mesh.
# ---------------------------------------------------------------------------


def test_fused_sp_train_block_matches_xla_sharded():
    """make_sharded_train_block(fused_kernels=True) == the XLA sharded
    hierarchical loss on the same (1, 4) sample mesh: identical ray
    draws, jitter, resample, and sigma-noise streams — the ONLY delta
    is the per-shard Pallas block-partials kernel pair vs the XLA
    encode->MLP->composite. Catches any fused/XLA semantic drift in the
    production sample-parallel layout."""
    from tinynerf_tpu.models.nerf import init_nerf
    from tinynerf_tpu.parallel.mesh import make_mesh
    from tinynerf_tpu.parallel.train import make_sharded_train_block
    from tinynerf_tpu.training import TrainSettings, init_train_state

    s = TrainSettings(
        n_rand=64, n_samples=16, num_freqs=4, lr=5e-4, sigma_noise_std=0.3
    )
    rng = np.random.RandomState(0)
    n_images, hw = 3, 64
    ro = jnp.asarray(rng.randn(n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    data = (ro, jnp.asarray(rd), jnp.asarray(rng.rand(n_images, hw, 3).astype(np.float32)))

    key = jax.random.PRNGKey(3)
    outs = []
    for fused in (False, True):
        mesh = make_mesh(n_devices=4, sample_parallel=4)
        block = make_sharded_train_block(
            s, 3, mesh, nerf_cfg=TINY, n_fine=8, fused_kernels=fused
        )
        params, opt_state = init_train_state(
            jax.random.PRNGKey(0), s, init_fn=lambda k: init_nerf(k, TINY)
        )
        params, opt_state, m = block(params, opt_state, key, jnp.int32(0), *data)
        outs.append((jax.tree_util.tree_leaves(params), m["loss"]))
    for a, b in zip(outs[0][0], outs[1][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(outs[0][1]), np.asarray(outs[1][1]), atol=1e-6
    )


def test_fused_sp_2d_mesh_learns():
    """Fused block-partials on the full 2-D (2 data x 4 sample) mesh."""
    from tinynerf_tpu.models.nerf import init_nerf
    from tinynerf_tpu.parallel.mesh import make_mesh
    from tinynerf_tpu.parallel.train import make_sharded_train_block
    from tinynerf_tpu.training import TrainSettings, init_train_state

    s = TrainSettings(n_rand=64, n_samples=16, num_freqs=4, lr=5e-4)
    rng = np.random.RandomState(1)
    n_images, hw = 3, 64
    ro = jnp.asarray(rng.randn(n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    data = (ro, jnp.asarray(rd), jnp.asarray(rng.rand(n_images, hw, 3).astype(np.float32)))

    mesh = make_mesh(sample_parallel=4)  # 2 x 4
    block = make_sharded_train_block(
        s, 20, mesh, nerf_cfg=TINY, n_fine=8, fused_kernels=True
    )
    params, opt_state = init_train_state(
        jax.random.PRNGKey(0), s, init_fn=lambda k: init_nerf(k, TINY)
    )
    key = jax.random.PRNGKey(1)
    losses = []
    for b in range(3):
        params, opt_state, m = block(params, opt_state, key, jnp.int32(b * 20), *data)
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_fused_sp_non_pow2_shard_trains():
    """Shard sizes that are not multiples of 128 (e.g. fine union 320
    over 2 sample peers -> 160) must train fused: the block size is the
    largest divisor of the shard (pick_sample_block), not min(128, sb)
    — the round-3 review regression."""
    from tinynerf_tpu.models.nerf import init_nerf
    from tinynerf_tpu.parallel.mesh import make_mesh
    from tinynerf_tpu.parallel.train import make_sharded_train_block
    from tinynerf_tpu.training import TrainSettings, init_train_state

    s = TrainSettings(n_rand=16, n_samples=64, num_freqs=4, lr=5e-4)
    rng = np.random.RandomState(2)
    n_images, hw = 2, 32
    ro = jnp.asarray(rng.randn(n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    data = (ro, jnp.asarray(rd),
            jnp.asarray(rng.rand(n_images, hw, 3).astype(np.float32)))

    mesh = make_mesh(n_devices=2, sample_parallel=2)
    block = make_sharded_train_block(
        s, 2, mesh, nerf_cfg=TINY, n_fine=256, fused_kernels=True
    )
    params, opt_state = init_train_state(
        jax.random.PRNGKey(0), s, init_fn=lambda k: init_nerf(k, TINY)
    )
    params, opt_state, m = block(
        params, opt_state, jax.random.PRNGKey(1), jnp.int32(0), *data
    )
    assert np.isfinite(np.asarray(m["loss"])).all()


def test_fused_kernels_without_nerf_cfg_rejected():
    from tinynerf_tpu.parallel.mesh import make_mesh
    from tinynerf_tpu.parallel.train import make_sharded_train_block
    from tinynerf_tpu.training import TrainSettings

    with pytest.raises(ValueError, match="nerf_cfg"):
        make_sharded_train_block(
            TrainSettings(n_rand=64, n_samples=16, num_freqs=4),
            3,
            make_mesh(),
            fused_kernels=True,
        )
