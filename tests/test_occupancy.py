"""Occupancy-grid proposal sampling (ops/occupancy.py): grid
construction, sample concentration, train-block learning, fused/XLA
equivalence, and the checkpoint->renderer roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf_mlp
from tinynerf_tpu.ops.occupancy import (
    default_aabb,
    density_grid,
    make_occupancy_train_block,
    occupancy_samples,
    pick_sample_block,
    ray_segment_alphas,
)
from tinynerf_tpu.training import TrainSettings, init_train_state

TINY = NeRFConfig(
    num_freqs=4, num_freqs_dir=2, hidden=32, depth=3, skip_at=2, rgb_hidden=16,
    compute_dtype=jnp.float32,
)


def _rays(R=16, seed=0):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, jnp.asarray(rd)


def test_density_grid_matches_pointwise_sigma():
    """Grid cells hold exactly the MLP's sigma at the cell center."""
    from tinynerf_tpu.models.nerf import apply_nerf_mlp
    from tinynerf_tpu.ops.encoding import positional_encoding

    mlp = init_nerf_mlp(jax.random.PRNGKey(0), TINY)
    g = density_grid(mlp, TINY, resolution=4)
    assert g.shape == (4, 4, 4)
    # reference value for cell (1, 2, 3)
    aabb = default_aabb()
    u = (jnp.array([1, 2, 3], jnp.float32) + 0.5) / 4
    pt = aabb[0] + u * (aabb[1] - aabb[0])
    x = positional_encoding(pt[None], num_freqs=TINY.num_freqs)
    d = positional_encoding(jnp.array([[0.0, 0.0, 1.0]]), num_freqs=TINY.num_freqs_dir)
    _, sig = apply_nerf_mlp(mlp, x, d, TINY)
    np.testing.assert_allclose(float(g[1, 2, 3]), float(sig[0, 0]), rtol=1e-5)


def test_sigma_is_view_independent():
    """The +z direction used for grid evals is arbitrary by
    construction: sigma branches off before the viewdir concat."""
    from tinynerf_tpu.models.nerf import apply_nerf_mlp
    from tinynerf_tpu.ops.encoding import positional_encoding

    mlp = init_nerf_mlp(jax.random.PRNGKey(1), TINY)
    x = positional_encoding(
        jnp.asarray(np.random.RandomState(0).randn(5, 3).astype(np.float32)),
        num_freqs=TINY.num_freqs,
    )
    d1 = positional_encoding(jnp.array([[0.0, 0.0, 1.0]] * 5), num_freqs=TINY.num_freqs_dir)
    d2 = positional_encoding(jnp.array([[1.0, 0.0, 0.0]] * 5), num_freqs=TINY.num_freqs_dir)
    _, s1 = apply_nerf_mlp(mlp, x, d1, TINY)
    _, s2 = apply_nerf_mlp(mlp, x, d2, TINY)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=0)


def test_samples_concentrate_in_occupied_cells():
    """An analytically-occupied octant captures ~all samples (modulo
    the exploration floor)."""
    g = jnp.zeros((8, 8, 8)).at[6:, 6:, 6:].set(50.0)
    rd = jnp.broadcast_to(jnp.array([1.0, 1.0, 1.0]) / jnp.sqrt(3.0), (4, 3))
    ro = jnp.zeros((4, 3))
    z = occupancy_samples(
        g, ro, rd, 0.1, 6.0, 64, n_segments=32, randomized=True,
        key=jax.random.PRNGKey(2),
    )
    # occupied cells: u in (0.75, 1) per axis -> world (1.5, 3.0) -> t in
    # (2.6, 5.2) along the diagonal
    frac = float(jnp.mean((z > 2.4) & (z < 5.3)))
    assert frac > 0.9, frac
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))  # sorted


def test_empty_grid_keeps_uniform_coverage():
    """floor > 0: an all-empty grid still covers [near, far] uniformly
    (the exploration term — empty space must stay learnable)."""
    g = jnp.zeros((8, 8, 8))
    ro, rd = _rays(R=64)
    z = occupancy_samples(
        g, ro, rd, 2.0, 6.0, 64, randomized=True, key=jax.random.PRNGKey(3)
    )
    # roughly uniform: each quartile of [2, 6] gets ~25% of samples
    for lo in (2.0, 3.0, 4.0, 5.0):
        frac = float(jnp.mean((z >= lo) & (z < lo + 1.0)))
        assert 0.15 < frac < 0.35, (lo, frac)


def test_outside_aabb_reads_empty():
    g = jnp.ones((4, 4, 4)) * 100.0
    ro = jnp.array([[10.0, 10.0, 10.0]])  # entire ray outside the box
    rd = jnp.array([[0.0, 0.0, 1.0]])
    a, _ = ray_segment_alphas(g, ro, rd, 2.0, 6.0, n_segments=8)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=0)


def test_aabb_from_rays_covers_all_sample_points():
    from tinynerf_tpu.ops.occupancy import aabb_from_rays

    ro, rd = _rays(R=64, seed=6)
    aabb = aabb_from_rays(ro, rd, 2.0, 6.0)
    for t in (2.0, 3.7, 6.0):
        pts = ro + rd * t
        assert bool(jnp.all(pts >= aabb[0])) and bool(jnp.all(pts <= aabb[1]))
    # scale-adaptivity: 10x bigger rig -> ~10x bigger box
    big = aabb_from_rays(ro * 10, rd, 20.0, 60.0)
    assert float(big[1][0] - big[0][0]) > 5 * float(aabb[1][0] - aabb[0][0])


def test_pick_sample_block():
    # Default cap is 64 (measured: 64 beats 128 at the S=512 streamed
    # train recipe, benchmarks/r4/tile_sweep.json).
    assert pick_sample_block(192) == 64
    assert pick_sample_block(448) == 64
    assert pick_sample_block(512) == 64
    assert pick_sample_block(64) == 64
    assert pick_sample_block(7) == 7
    # Divisor search under an explicit cap (S with no divisor == cap).
    assert pick_sample_block(192, cap=128) == 96
    assert pick_sample_block(448, cap=128) == 112
    assert pick_sample_block(96, cap=64) == 48


def test_occupancy_train_block_learns_and_fused_matches_xla():
    s = TrainSettings(n_rand=32, n_samples=16, num_freqs=4, lr=5e-3)
    rng = np.random.RandomState(0)
    n_images, hw = 2, 64
    ro = jnp.asarray(rng.randn(n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    pix = jnp.asarray(rng.rand(n_images, hw, 3).astype(np.float32))
    init = lambda k: {"fine": init_nerf_mlp(k, TINY)}

    blk = make_occupancy_train_block(s, 10, TINY, resolution=8, n_segments=16)
    params, opt_state = init_train_state(jax.random.PRNGKey(0), s, init_fn=init)
    losses = []
    for b in range(4):
        params, opt_state, m = blk(
            params, opt_state, jax.random.PRNGKey(9), jnp.int32(b * 10),
            ro, rd, pix,
        )
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # Fused (streamed-kernel) twin: identical RNG -> near-identical
    # trajectory (f32 compute in TINY).
    blkf = make_occupancy_train_block(
        s, 10, TINY, resolution=8, n_segments=16, fused=True, interpret=True
    )
    pf, of = init_train_state(jax.random.PRNGKey(0), s, init_fn=init)
    p2, o2 = init_train_state(jax.random.PRNGKey(0), s, init_fn=init)
    blk2 = make_occupancy_train_block(s, 10, TINY, resolution=8, n_segments=16)
    pf, of, mf = blkf(pf, of, jax.random.PRNGKey(9), jnp.int32(0), ro, rd, pix)
    p2, o2, m2 = blk2(p2, o2, jax.random.PRNGKey(9), jnp.int32(0), ro, rd, pix)
    np.testing.assert_allclose(
        np.asarray(mf["loss"]), np.asarray(m2["loss"]), atol=1e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_occupancy_dp_mesh_learns():
    """Occupancy block on the 8-device data mesh: finite, decreasing
    loss; params stay replicated; sample meshes are rejected."""
    from tinynerf_tpu.parallel.mesh import make_mesh

    s = TrainSettings(n_rand=64, n_samples=16, num_freqs=4, lr=5e-3)
    rng = np.random.RandomState(3)
    n_images, hw = 2, 64
    ro = jnp.asarray(rng.randn(n_images, hw, 3).astype(np.float32) * 0.1)
    rd = rng.randn(n_images, hw, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    pix = jnp.asarray(rng.rand(n_images, hw, 3).astype(np.float32))
    init = lambda k: {"fine": init_nerf_mlp(k, TINY)}

    mesh = make_mesh()  # 8-way data
    blk = make_occupancy_train_block(
        s, 10, TINY, resolution=8, n_segments=16, mesh=mesh
    )
    params, opt_state = init_train_state(jax.random.PRNGKey(0), s, init_fn=init)
    losses = []
    for b in range(4):
        params, opt_state, m = blk(
            params, opt_state, jax.random.PRNGKey(9), jnp.int32(b * 10),
            ro, rd, pix,
        )
        losses.append(float(m["loss"].mean()))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    with pytest.raises(ValueError, match="data-parallel meshes only"):
        make_occupancy_train_block(
            s, 10, TINY, mesh=make_mesh(sample_parallel=2)
        )


def test_occupancy_renderer_chunk_invariance():
    from tinynerf_tpu.render import make_occupancy_image_renderer

    mlp = {"fine": init_nerf_mlp(jax.random.PRNGKey(4), TINY)}
    kw = dict(H=16, W=16, focal=20.0, n_samples=24, nerf_cfg=TINY,
              resolution=8, n_segments=16)
    pose = jnp.eye(4).at[2, 3].set(4.0)
    img_a = make_occupancy_image_renderer(chunk=64, **kw)(mlp, pose)
    img_b = make_occupancy_image_renderer(chunk=256, **kw)(mlp, pose)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), atol=1e-6)


def test_occupancy_driver_end_to_end(tmp_path):
    """--model nerf --proposal occupancy trains, checkpoints, and the
    GIF consumer rebuilds the grid-proposal renderer from meta."""
    from tinynerf_tpu import make_gif, train
    from tinynerf_tpu.config import Config

    from tinynerf_tpu.synthetic import generate_synthetic_dataset

    d = generate_synthetic_dataset(n_poses=6, h=24, w=24, seed=5)
    data = str(tmp_path / "tiny.npz")
    np.savez(data, images=d["images"], poses=d["poses"], focal=d["focal"])
    cfg = Config(
        data_path=data, iters=30, n_rand=64, n_samples=8, n_fine=8,
        num_freqs=4, num_freqs_dir=2, hidden=16, nerf_depth=2,
        nerf_skip_at=1, rgb_hidden=8, model="nerf", proposal="occupancy",
        log_every=10, preview_every=20, ckpt_every=20, chunk=128,
        ckpt_path=str(tmp_path / "occ.npz"), out_dir=str(tmp_path / "out"),
        resume=False, bf16=False, holdout=2,
    )
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])

    gif_cfg = make_gif.GifConfig(
        data_path=data, ckpt_path=str(tmp_path / "occ.npz"),
        out_path=str(tmp_path / "nv.gif"), n_frames=3, n_samples=8,
        chunk=128,
    )
    make_gif.main(gif_cfg)
    assert (tmp_path / "nv.gif").exists()

    # The grid bounds persist in meta (render consumers rebuild the
    # identical sampler).
    import json

    with np.load(str(tmp_path / "occ.npz"), allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))["meta"]
    box = np.asarray(meta["cfg"]["occ_aabb"])
    assert box.shape == (2, 3) and (box[1] > box[0]).all()

    with pytest.raises(ValueError, match="occupancy"):
        train.main(
            __import__("dataclasses").replace(cfg, model="tinynerf")
        )


def test_occupancy_ndc_end_to_end(tmp_path):
    """--proposal occupancy --ndc: the grid covers the NDC cube
    ([-1,1]^3) and sampling runs over t in [0,1]; trains finite and the
    checkpoint meta reconstructs the NDC+occupancy renderer."""
    import dataclasses

    from tinynerf_tpu import train
    from tinynerf_tpu.config import Config
    from tinynerf_tpu.synthetic import generate_synthetic_dataset

    d = generate_synthetic_dataset(
        n_poses=4, h=24, w=24, seed=7, forward_facing=True
    )
    data = str(tmp_path / "ff.npz")
    np.savez(data, images=d["images"], poses=d["poses"], focal=d["focal"])
    cfg = Config(
        data_path=data, iters=20, n_rand=64, n_samples=8, n_fine=8,
        num_freqs=4, num_freqs_dir=2, hidden=16, nerf_depth=2,
        nerf_skip_at=1, rgb_hidden=8, model="nerf", proposal="occupancy",
        ndc=True, log_every=10, preview_every=20, ckpt_every=20, chunk=128,
        ckpt_path=str(tmp_path / "occ_ndc.npz"),
        out_dir=str(tmp_path / "out"), resume=False, bf16=False,
    )
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])

    from tinynerf_tpu.utils.model_io import load_model_and_renderer

    params, renderer, meta = load_model_and_renderer(
        cfg.ckpt_path, H=24, W=24, focal=float(d["focal"]), n_samples=8,
        n_fine=8, chunk=128,
    )
    assert meta["cfg"]["proposal"] == "occupancy"
    img = renderer(params, jnp.asarray(d["poses"][0]))
    assert np.isfinite(np.asarray(img)).all()