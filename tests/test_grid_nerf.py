"""Grid-encoded NeRF family (models/grid_nerf.py): encoding math,
model behavior, loss training dynamics, and driver e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.models.grid_nerf import (
    GridNeRFConfig,
    apply_grid_nerf,
    count_params,
    grid_encode,
    init_grid_nerf,
    make_grid_loss,
    render_rays_grid,
)

TINY = GridNeRFConfig(
    n_levels=3,
    features=2,
    base_res=4,
    max_res=16,
    table_size=1 << 10,
    hidden=16,
    geo_features=7,
    num_freqs_dir=2,
    aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
    compute_dtype=jnp.float32,
)


class TestConfig:
    def test_level_ladder_endpoints(self):
        res = TINY.level_resolutions()
        assert res[0] == 4 and res[-1] == 16 and list(res) == sorted(res)

    def test_dense_vs_hashed_split(self):
        # 5^3=125 and 9^3=729 fit the 1024-entry budget; 17^3 does not.
        assert TINY.level_is_dense() == (True, True, False)
        assert TINY.level_table_sizes() == (125, 729, 1024)


class TestEncoding:
    def test_dense_corner_lookup_exact(self):
        """At exact grid corners the trilinear blend is a pure lookup."""
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        res0 = TINY.level_resolutions()[0]
        # Corner (1, 2, 3) of level 0 in world coords (aabb [-1, 1]).
        ijk = np.array([1, 2, 3])
        pt = (ijk / res0) * 2.0 - 1.0
        feats = grid_encode(params["tables"], jnp.asarray([pt]), TINY)
        side = res0 + 1
        lin = (ijk[0] * side + ijk[1]) * side + ijk[2]
        np.testing.assert_allclose(
            np.asarray(feats)[0, :2],
            np.asarray(params["tables"]["l0"])[lin],
            rtol=1e-5,
            atol=1e-7,
        )

    def test_trilinear_reproduces_linear_field(self):
        """A table whose features are a linear function of corner
        position is reproduced EXACTLY at arbitrary interior points
        (trilinear interpolation is exact on per-cell-linear fields)."""
        cfg = GridNeRFConfig(
            n_levels=1, features=2, base_res=8, max_res=8,
            table_size=1 << 12, aabb=(0, 0, 0, 1, 1, 1),
            compute_dtype=jnp.float32,
        )
        res = 8
        side = res + 1
        ii, jj, kk = np.meshgrid(
            np.arange(side), np.arange(side), np.arange(side), indexing="ij"
        )
        lin_field = (
            0.3 * ii / res + 0.5 * jj / res - 0.2 * kk / res
        ).reshape(-1)
        tables = {
            "l0": jnp.stack([lin_field, 2.0 * lin_field], axis=-1).astype(
                jnp.float32
            )
        }
        pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        feats = np.asarray(grid_encode(tables, pts, cfg))
        p = np.asarray(pts)
        expect = 0.3 * p[:, 0] + 0.5 * p[:, 1] - 0.2 * p[:, 2]
        np.testing.assert_allclose(feats[:, 0], expect, atol=1e-5)
        np.testing.assert_allclose(feats[:, 1], 2 * expect, atol=1e-5)

    def test_out_of_box_points_clamp(self):
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        far_out = jnp.asarray([[9.0, -9.0, 9.0], [1.0, -1.0, 1.0]])
        feats = grid_encode(params["tables"], far_out, TINY)
        assert bool(jnp.all(jnp.isfinite(feats)))
        # Clamped point == the box-corner point's features.
        np.testing.assert_allclose(
            np.asarray(feats[0]), np.asarray(feats[1]), rtol=1e-6
        )

    def test_hash_indices_in_range_and_deterministic(self):
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        pts = jax.random.uniform(jax.random.PRNGKey(2), (128, 3), minval=-1, maxval=1)
        f1 = grid_encode(params["tables"], pts, TINY)
        f2 = grid_encode(params["tables"], pts, TINY)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        assert f1.shape == (128, TINY.n_levels * TINY.features)


class TestModel:
    def test_apply_shapes_and_ranges(self):
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (64, 1))
        rgb, sigma = apply_grid_nerf(params, pts, dirs, TINY)
        assert rgb.shape == (64, 3) and sigma.shape == (64,)
        assert bool(jnp.all((rgb >= 0) & (rgb <= 1)))
        assert bool(jnp.all(sigma >= 0))

    def test_sigma_noise_perturbs_pre_relu(self):
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        pts = jnp.zeros((8, 3))
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))
        _, s0 = apply_grid_nerf(params, pts, dirs, TINY)
        _, s_neg = apply_grid_nerf(
            params, pts, dirs, TINY, sigma_noise=jnp.full((8,), -1e9)
        )
        np.testing.assert_array_equal(np.asarray(s_neg), 0.0)
        _, s_pos = apply_grid_nerf(
            params, pts, dirs, TINY, sigma_noise=jnp.full((8,), 5.0)
        )
        assert bool(jnp.all(s_pos >= s0))

    def test_param_count_matches_config(self):
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        n_tables = sum(TINY.level_table_sizes()) * TINY.features
        feat = TINY.n_levels * TINY.features
        dird = 3 + 6 * TINY.num_freqs_dir
        n_mlp = (
            (feat + 1) * TINY.hidden
            + (TINY.hidden + 1) * (1 + TINY.geo_features)
            + (TINY.geo_features + dird + 1) * TINY.hidden
            + (TINY.hidden + 1) * TINY.hidden
            + (TINY.hidden + 1) * 3
        )
        assert count_params(params) == n_tables + n_mlp


class TestTraining:
    def test_loss_decreases_and_tables_update(self):
        import optax

        from tinynerf_tpu.training import TrainSettings

        s = TrainSettings(n_rand=128, n_samples=16, near=0.5, far=2.5)
        cfg = TINY
        loss = make_grid_loss(cfg)
        params = init_grid_nerf(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(5e-3)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(3)
        ro = jnp.zeros((128, 3))
        rd = jax.random.normal(key, (128, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        tgt = jnp.tile(jnp.asarray([[1.0, 0.2, 0.1]]), (128, 1))

        @jax.jit
        def step(p, o, k):
            (l, m), g = jax.value_and_grad(
                lambda p_: loss(p_, ro, rd, tgt, k, s), has_aux=True
            )(p)
            up, o = opt.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        t0 = params["tables"]["l0"]
        losses = []
        for i in range(30):
            params, opt_state, l = step(
                params, opt_state, jax.random.fold_in(key, i)
            )
            losses.append(float(l))
        assert losses[-1] < losses[0] * 0.7, losses
        assert float(jnp.abs(params["tables"]["l0"] - t0).max()) > 0

    def test_render_rays_deterministic_without_key(self):
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        ro = jnp.zeros((32, 3))
        rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (32, 1))
        c1, *_ = render_rays_grid(
            params, ro, rd, None, cfg=TINY, n_samples=8, near=0.5, far=2.5
        )
        c2, *_ = render_rays_grid(
            params, ro, rd, None, cfg=TINY, n_samples=8, near=0.5, far=2.5
        )
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


class TestParallel:
    def test_dp_grid_block_runs_and_learns(self):
        """The grid loss under the 8-way data mesh (grad pmean over the
        ray shards): finite, decreasing, replicated-consistent."""
        from tinynerf_tpu.parallel.mesh import make_mesh
        from tinynerf_tpu.parallel.train import make_sharded_train_block
        from tinynerf_tpu.training import TrainSettings, init_train_state

        s = TrainSettings(n_rand=128, n_samples=16, near=0.5, far=2.5, lr=5e-3)
        loss = make_grid_loss(TINY)
        rng = np.random.RandomState(0)
        ro = jnp.asarray(rng.randn(3, 64, 3).astype(np.float32) * 0.1)
        rd = rng.randn(3, 64, 3).astype(np.float32)
        rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
        px = jnp.asarray(rng.rand(3, 64, 3).astype(np.float32))
        mesh = make_mesh()  # 8-way data parallel
        block = make_sharded_train_block(s, 25, mesh, loss=loss)
        params, opt_state = init_train_state(
            jax.random.PRNGKey(0), s,
            init_fn=lambda k: init_grid_nerf(k, TINY),
        )
        key = jax.random.PRNGKey(1)
        losses = []
        for b in range(4):
            params, opt_state, m = block(
                params, opt_state, key, jnp.int32(b * 25), ro, rd, px
            )
            losses.append(float(m["loss"].mean()))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses


@pytest.fixture(scope="module")
def tiny_npz(tmp_path_factory):
    """A 6-pose 24x24 synthetic dataset on disk (npz schema)."""
    from tinynerf_tpu.synthetic import generate_synthetic_dataset

    d = generate_synthetic_dataset(n_poses=6, h=24, w=24, seed=5)
    path = str(tmp_path_factory.mktemp("data") / "tiny.npz")
    np.savez(path, images=d["images"], poses=d["poses"], focal=d["focal"])
    return path


class TestDriver:
    def test_grid_ndc_e2e(self, tmp_path, tmp_path_factory):
        """--model grid --ndc: the AABB must be the NDC cube (not
        derived from world rays) and rendering must reproject the same
        way; exercises the grid_aabb NDC branch end to end."""
        from tinynerf_tpu import train
        from tinynerf_tpu.config import Config
        from tinynerf_tpu.synthetic import generate_synthetic_dataset

        ff = generate_synthetic_dataset(
            n_poses=4, h=24, w=24, seed=7, forward_facing=True
        )
        path = str(tmp_path_factory.mktemp("ffdata") / "ff.npz")
        np.savez(path, images=ff["images"], poses=ff["poses"], focal=ff["focal"])
        cfg = Config(
            iters=8, n_rand=64, n_samples=8, model="grid", ndc=True,
            grid_levels=2, grid_base_res=4, grid_max_res=8,
            grid_table_size=256, grid_hidden=8,
            data_path=path, allow_synthetic=False,
            ckpt_path=str(tmp_path / "g.npz"), out_dir=str(tmp_path / "o"),
            resume=False, log_every=4, preview_every=8, ckpt_every=8,
            chunk=256, bf16=False,
        )
        res = train.main(cfg)
        assert np.isfinite(res["final_psnr"])
        # The persisted box must be the NDC cube.
        import json as json_lib

        with np.load(cfg.ckpt_path, allow_pickle=False) as z:
            meta = json_lib.loads(str(z["meta"]))["meta"]
        assert meta["cfg"]["grid"]["aabb"] == [-1, -1, -1, 1, 1, 1]

    def test_train_eval_gif_e2e(self, tmp_path, tiny_npz):
        """--model grid end to end: train (ckpt + resume meta), eval,
        make_gif all consume the grid family through the standard
        surfaces."""
        from tinynerf_tpu import eval as eval_cli
        from tinynerf_tpu import make_gif, train
        from tinynerf_tpu.config import Config

        ck = str(tmp_path / "grid.npz")
        cfg = Config(
            iters=8,
            n_rand=64,
            n_samples=8,
            model="grid",
            grid_levels=2,
            grid_base_res=4,
            grid_max_res=8,
            grid_table_size=256,
            grid_hidden=8,
            data_path=str(tiny_npz),
            allow_synthetic=False,
            ckpt_path=ck,
            out_dir=str(tmp_path / "out"),
            resume=False,
            log_every=4,
            preview_every=8,
            ckpt_every=8,
            chunk=256,
            bf16=False,
        )
        res = train.main(cfg)
        assert np.isfinite(res["final_psnr"])

        ev = eval_cli.main(
            eval_cli.EvalConfig(
                ckpt_path=ck, data_path=str(tiny_npz), views=1,
                out_dir=str(tmp_path / "ev"), chunk=256,
            )
        )
        assert np.isfinite(ev["psnr_mean"])

        gif = make_gif.main(
            make_gif.GifConfig(
                ckpt_path=ck, data_path=str(tiny_npz), n_frames=2,
                out_path=str(tmp_path / "g.gif"), chunk=256,
            )
        )
        assert gif is None or gif  # main returns None; file must exist
        assert (tmp_path / "g.gif").exists()


class TestEncodeImplParity:
    """The cat/cat_pib gather strategies (one concatenated table, one
    gather for all levels+corners) must be bit-compatible with the
    per-level loop — value AND table-gradient parity (the backward is a
    scatter-add whose transpose differs structurally between paths)."""

    def _variants(self):
        import dataclasses

        return [
            dataclasses.replace(TINY, encode_impl=impl)
            for impl in ("cat", "cat_pib")
        ]

    def test_value_parity(self):
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        pts = jax.random.uniform(
            jax.random.PRNGKey(1), (257, 3), jnp.float32, -1.3, 1.3
        )  # includes out-of-box points (clamp path)
        ref = np.asarray(grid_encode(params["tables"], pts, TINY))
        for cfg in self._variants():
            v = np.asarray(grid_encode(params["tables"], pts, cfg))
            np.testing.assert_allclose(v, ref, rtol=0, atol=1e-6)

    def test_table_grad_parity(self):
        params = init_grid_nerf(jax.random.PRNGKey(0), TINY)
        pts = jax.random.uniform(
            jax.random.PRNGKey(2), (129, 3), jnp.float32, -1.0, 1.0
        )
        cot = jax.random.normal(
            jax.random.PRNGKey(3), (129, TINY.n_levels * TINY.features)
        )

        def g(cfg):
            return jax.grad(
                lambda t: jnp.sum(grid_encode(t, pts, cfg) * cot)
            )(params["tables"])

        ref = g(TINY)
        for cfg in self._variants():
            got = g(cfg)
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]),
                    rtol=0, atol=1e-5, err_msg=f"{cfg.encode_impl}:{k}",
                )
