"""Geometry (depth/acc) rendering: the aux renderer path.

The reference has no depth output at all; the original NeRF's artifacts
include depth renders, so the framework provides them as a first-class
renderer mode (render.make_*_renderer(aux=True), eval --save-depth,
make_gif --depth). Aux rides the generic 3-channel chunked driver as a
packed pseudo-image (render.pack_aux), so these tests pin (a) exact
agreement with a direct volume_render computation, (b) the pack/unpack
round-trip, and (c) the CLI surfaces end to end.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.config import Config
from tinynerf_tpu.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def tiny_npz(tmp_path_factory):
    d = generate_synthetic_dataset(n_poses=6, h=24, w=24, seed=5)
    path = str(tmp_path_factory.mktemp("data") / "tiny.npz")
    np.savez(path, images=d["images"], poses=d["poses"], focal=d["focal"])
    return path


def test_tinynerf_aux_matches_direct_volume_render():
    from tinynerf_tpu.models.tinynerf import TinyNeRFConfig, apply_tinynerf, init_tinynerf
    from tinynerf_tpu.ops.encoding import encoding_dim, positional_encoding
    from tinynerf_tpu.ops.rays import get_rays
    from tinynerf_tpu.ops.sampling import stratified_samples
    from tinynerf_tpu.ops.volume import volume_render
    from tinynerf_tpu.render import make_image_renderer, unpack_aux

    H = W = 16
    focal, near, far, n_samples, num_freqs = 20.0, 2.0, 6.0, 8, 4
    mcfg = TinyNeRFConfig(
        in_dim=encoding_dim(num_freqs), hidden=16, compute_dtype=jnp.float32
    )
    params = init_tinynerf(jax.random.PRNGKey(0), mcfg)
    pose = jnp.eye(4)

    renderer = make_image_renderer(
        H=H, W=W, focal=focal, chunk=128, n_samples=n_samples,
        near=near, far=far, num_freqs=num_freqs, model_cfg=mcfg, aux=True,
    )
    depth, acc = unpack_aux(np.asarray(renderer(params, pose)), near, far)

    ro, rd = get_rays(H, W, focal, pose)
    z, pts = stratified_samples(near, far, n_samples, ro, rd, randomized=False)
    rgb, sigma = apply_tinynerf(
        params, positional_encoding(pts.reshape(-1, 3), num_freqs=num_freqs), mcfg
    )
    _, depth_ref, acc_ref, _ = volume_render(
        rgb.reshape(-1, n_samples, 3), sigma.reshape(-1, n_samples), z, rd
    )
    depth_ref = np.asarray(depth_ref).reshape(-1)
    acc_ref = np.asarray(acc_ref).reshape(-1)
    # The packed channel is the EXPECTED termination depth sum(w*z)/acc,
    # clipped to [near, far] by the chunked driver's [0,1] clip.
    exp_ref = np.clip(depth_ref / np.maximum(acc_ref, 1e-6), near, far)
    np.testing.assert_allclose(depth.reshape(-1), exp_ref, rtol=0, atol=1e-3)
    np.testing.assert_allclose(acc.reshape(-1), acc_ref, rtol=0, atol=1e-5)
    assert depth.min() >= near - 1e-4 and depth.max() <= far + 1e-4
    assert acc.min() >= 0.0 and acc.max() <= 1.0 + 1e-5


def test_hierarchical_aux_matches_direct_fine_pass():
    from tinynerf_tpu.models.nerf import (
        NeRFConfig, init_nerf, render_rays_hierarchical,
    )
    from tinynerf_tpu.ops.rays import get_rays
    from tinynerf_tpu.render import make_hierarchical_image_renderer, unpack_aux

    H = W = 16
    focal, near, far = 20.0, 2.0, 6.0
    ncfg = NeRFConfig(
        num_freqs=4, num_freqs_dir=2, hidden=16, depth=3, skip_at=2,
        rgb_hidden=16, compute_dtype=jnp.float32,
    )
    params = init_nerf(jax.random.PRNGKey(1), ncfg)
    pose = jnp.eye(4)

    renderer = make_hierarchical_image_renderer(
        H=H, W=W, focal=focal, chunk=256, n_coarse=8, n_fine=8,
        near=near, far=far, nerf_cfg=ncfg, aux=True,
    )
    depth, acc = unpack_aux(np.asarray(renderer(params, pose)), near, far)

    ro, rd = get_rays(H, W, focal, pose)
    _, _, depth_ref, acc_ref = render_rays_hierarchical(
        params, ro, rd, n_coarse=8, n_fine=8, near=near, far=far,
        cfg=ncfg, randomized=False, return_aux=True,
    )
    depth_ref = np.asarray(depth_ref).reshape(-1)
    acc_ref = np.asarray(acc_ref).reshape(-1)
    exp_ref = np.clip(depth_ref / np.maximum(acc_ref, 1e-6), near, far)
    np.testing.assert_allclose(depth.reshape(-1), exp_ref, rtol=0, atol=1e-3)
    np.testing.assert_allclose(acc.reshape(-1), acc_ref, rtol=0, atol=1e-5)


def test_eval_save_depth_and_gif_depth_end_to_end(tiny_npz, tmp_path):
    """Train a micro checkpoint, then drive eval --save-depth and
    make_gif --depth exactly as a user would."""
    from tinynerf_tpu import eval as eval_mod
    from tinynerf_tpu import make_gif, train

    cfg = Config(
        data_path=tiny_npz, allow_synthetic=False, iters=16, n_rand=64,
        n_samples=8, num_freqs=4, hidden=16, log_every=8,
        preview_every=1000, ckpt_every=16, chunk=128, bf16=False,
        ckpt_path=str(tmp_path / "ck.npz"), out_dir=str(tmp_path / "out"),
        resume=False,
    )
    train.main(cfg)

    out_dir = str(tmp_path / "eval")
    eval_mod.main(eval_mod.EvalConfig(
        ckpt_path=cfg.ckpt_path, data_path=tiny_npz, allow_synthetic=False,
        out_dir=out_dir, views=2, n_samples=8, chunk=128,
        save_images=False, save_depth=True,
    ))
    depth_pngs = [f for f in os.listdir(out_dir) if f.startswith("depth_")]
    acc_pngs = [f for f in os.listdir(out_dir) if f.startswith("acc_")]
    assert len(depth_pngs) == 2 and len(acc_pngs) == 2, os.listdir(out_dir)

    gif_path = str(tmp_path / "depth.gif")
    make_gif.main(make_gif.GifConfig(
        ckpt_path=cfg.ckpt_path, data_path=tiny_npz, allow_synthetic=False,
        out_path=gif_path, n_frames=3, n_samples=8, chunk=128, depth=True,
    ))
    assert os.path.getsize(gif_path) > 0


def test_eval_save_depth_ndc_checkpoint(tmp_path):
    """NDC checkpoints sample t in [0,1]: model_io remaps the aux
    renderer's near/far, and eval's unpack must use the SAME range or
    every depth map would silently tone-map against world near/far."""
    from tinynerf_tpu import eval as eval_mod
    from tinynerf_tpu import train

    d = generate_synthetic_dataset(n_poses=6, h=24, w=24, seed=7, forward_facing=True)
    npz = str(tmp_path / "ff.npz")
    np.savez(npz, images=d["images"], poses=d["poses"], focal=d["focal"])
    cfg = Config(
        data_path=npz, allow_synthetic=False, ndc=True, iters=16, n_rand=64,
        n_samples=8, num_freqs=4, hidden=16, log_every=8,
        preview_every=1000, ckpt_every=16, chunk=128, bf16=False,
        ckpt_path=str(tmp_path / "ndc.npz"), out_dir=str(tmp_path / "out"),
        resume=False,
    )
    train.main(cfg)
    out_dir = str(tmp_path / "eval_ndc")
    eval_mod.main(eval_mod.EvalConfig(
        ckpt_path=cfg.ckpt_path, data_path=npz, allow_synthetic=False,
        out_dir=out_dir, views=1, n_samples=8, chunk=128,
        save_images=False, save_depth=True,
    ))
    import imageio.v2 as imageio

    name = next(f for f in os.listdir(out_dir) if f.startswith("depth_"))
    png = imageio.imread(os.path.join(out_dir, name))
    assert png.shape[-1] == 3 and png.max() <= 255
    # A finite, non-constant depth map (the tone map would collapse to
    # all-black or all-white if the pack/unpack ranges disagreed).
    assert png.std() > 0, "depth map is constant — near/far range mismatch?"


def test_eval_save_depth_occupancy_checkpoint(tiny_npz, tmp_path):
    """The occupancy-proposal restore path builds its aux renderer over
    the persisted grid AABB like the color one."""
    from tinynerf_tpu import eval as eval_mod
    from tinynerf_tpu import train

    cfg = Config(
        data_path=tiny_npz, allow_synthetic=False, iters=16, n_rand=64,
        n_samples=8, n_fine=8, num_freqs=4, hidden=16, rgb_hidden=16,
        model="nerf", proposal="occupancy", log_every=8,
        preview_every=1000, ckpt_every=16, chunk=128, bf16=False,
        ckpt_path=str(tmp_path / "occ.npz"), out_dir=str(tmp_path / "out"),
        resume=False,
    )
    train.main(cfg)
    out_dir = str(tmp_path / "eval_occ")
    eval_mod.main(eval_mod.EvalConfig(
        ckpt_path=cfg.ckpt_path, data_path=tiny_npz, allow_synthetic=False,
        out_dir=out_dir, views=1, n_samples=8, chunk=128,
        save_images=False, save_depth=True,
    ))
    assert any(f.startswith("depth_") for f in os.listdir(out_dir))
