"""End-to-end driver tests on CPU: train.main with a tiny dataset.

Exercises the full surface in-process: data load, train blocks,
preview/ckpt cadence, resume, final render, holdout eval — the
regression net for the CLI drivers without needing a TPU.
"""

import os

import jax
import numpy as np
import pytest

from tinynerf_tpu.config import Config
from tinynerf_tpu.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def tiny_npz(tmp_path_factory):
    """A 6-pose 24x24 synthetic dataset on disk (npz schema)."""
    d = generate_synthetic_dataset(n_poses=6, h=24, w=24, seed=5)
    path = str(tmp_path_factory.mktemp("data") / "tiny.npz")
    np.savez(path, images=d["images"], poses=d["poses"], focal=d["focal"])
    return path


def _cfg(tiny_npz, tmp_path, **kw):
    defaults = dict(
        data_path=tiny_npz,
        iters=40,
        n_rand=64,
        n_samples=8,
        num_freqs=4,
        hidden=16,
        log_every=10,
        preview_every=20,
        ckpt_every=20,
        chunk=128,
        ckpt_path=str(tmp_path / "ckpt.npz"),
        out_dir=str(tmp_path / "out"),
        resume=True,
        bf16=False,
    )
    defaults.update(kw)
    return Config(**defaults)


def test_train_main_end_to_end(tiny_npz, tmp_path):
    from tinynerf_tpu import train

    cfg = _cfg(tiny_npz, tmp_path, holdout=2)
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])
    assert res["eval"]["psnr_mean"] > 5  # held-out eval ran
    assert os.path.exists(cfg.ckpt_path)
    assert os.path.exists(f"{cfg.out_dir}/final.png")
    assert os.path.exists(f"{cfg.out_dir}/preview_000020.png")

    # Resume: start_step == iters -> no-op loop, still finishes cleanly.
    res2 = train.main(cfg)
    assert os.path.exists(f"{cfg.out_dir}/final.png")


def test_train_main_nerf_model(tiny_npz, tmp_path):
    from tinynerf_tpu import train

    cfg = _cfg(
        tiny_npz,
        tmp_path,
        model="nerf",
        n_fine=8,
        nerf_depth=2,
        nerf_skip_at=1,
        rgb_hidden=8,
        iters=20,
        preview_every=20,
        ckpt_every=20,
    )
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])


def test_make_gif_from_checkpoint(tiny_npz, tmp_path):
    from tinynerf_tpu import make_gif, train

    cfg = _cfg(tiny_npz, tmp_path, iters=20, preview_every=20, ckpt_every=20)
    train.main(cfg)
    gcfg = make_gif.GifConfig(
        ckpt_path=cfg.ckpt_path,
        data_path=tiny_npz,
        out_path=str(tmp_path / "views.gif"),
        n_frames=3,
        n_samples=8,
        chunk=128,
    )
    make_gif.main(gcfg)
    assert os.path.exists(gcfg.out_path)


def test_smoke_main(tiny_npz, tmp_path):
    """tinynerf_tpu.main (the reference's src/main.py smoke test) runs
    end-to-end and writes the untrained preview (PARITY row 12)."""
    from tinynerf_tpu import main as smoke

    cfg = _cfg(tiny_npz, tmp_path)
    smoke.main(cfg)
    assert os.path.exists(f"{cfg.out_dir}/preview.png")


def test_single_file_example_trains(tiny_npz, tmp_path, monkeypatch):
    """examples/tiny_nerf_min.py (self-contained tutorial, PARITY row
    14) trains at a tiny config: loss decreases and artifacts land."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "tiny_nerf_min.py"
    )
    spec = importlib.util.spec_from_file_location("tiny_nerf_min_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.setattr(mod, "ITERS", 40)
    monkeypatch.setattr(mod, "N_RAND", 64)
    monkeypatch.setattr(mod, "N_SAMPLES", 8)
    monkeypatch.setattr(mod, "LOG_EVERY", 20)
    monkeypatch.setattr(mod, "PREVIEW_EVERY", 40)
    monkeypatch.setattr(mod, "DATA_PATH", tiny_npz)
    monkeypatch.setattr(mod, "OUT_DIR", str(tmp_path / "min_out"))
    monkeypatch.setattr(mod, "CKPT", str(tmp_path / "min_ckpt.npz"))
    mod.train()
    assert os.path.exists(str(tmp_path / "min_ckpt.npz"))
    assert os.path.exists(str(tmp_path / "min_out" / "min_preview_000040.png"))


def test_single_file_example_synthetic_fallback(tmp_path, monkeypatch):
    """With no npz on disk the example generates its inline synthetic
    scene (offline-friendly like the framework's data layer)."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "tiny_nerf_min.py"
    )
    spec = importlib.util.spec_from_file_location("tiny_nerf_min_fb", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "DATA_PATH", str(tmp_path / "missing.npz"))
    images, poses, focal = mod.load_data()
    assert images.shape[1:] == (64, 64, 3) and poses.shape[1:] == (4, 4)
    assert np.isfinite(images).all() and images.min() >= 0 and images.max() <= 1


def test_unknown_model_rejected(tiny_npz, tmp_path):
    from tinynerf_tpu import train

    with pytest.raises(ValueError):
        train.main(_cfg(tiny_npz, tmp_path, model="bogus"))


def test_fused_train_with_sample_parallel_tinynerf_rejected(tiny_npz, tmp_path):
    """--fused-train + --sample-parallel > 1 used to SILENTLY drop the
    fused kernel and train the XLA sharded loss (VERDICT r2 weak #3);
    for tinynerf (no block-partials kernel) it must fail loud."""
    from tinynerf_tpu import train

    cfg = _cfg(
        tiny_npz, tmp_path, fused_train=True,
        data_parallel=True, sample_parallel=2,
    )
    with pytest.raises(ValueError, match="fused-train"):
        train.main(cfg)


def test_fused_train_with_sample_parallel_nerf_composes(tiny_npz, tmp_path):
    """--model nerf --fused-train --data-parallel --sample-parallel 2:
    the driver routes to the sharded loss with the block-partials
    Pallas kernels (kernels/fused_partials.py) and learns end to end —
    the round-2 silent-drop combination, now a real capability."""
    from tinynerf_tpu import train

    cfg = _cfg(
        tiny_npz, tmp_path, model="nerf", n_fine=8, fused_train=True,
        data_parallel=True, sample_parallel=2, holdout=2,
    )
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])
    assert res["eval"]["psnr_mean"] > 5


def test_sample_parallel_without_data_parallel_rejected(tiny_npz, tmp_path):
    """--sample-parallel alone used to silently run unsharded (ADVICE
    r2): the mesh only exists inside the data_parallel branch."""
    from tinynerf_tpu import train

    with pytest.raises(ValueError, match="data-parallel"):
        train.main(_cfg(tiny_npz, tmp_path, sample_parallel=2))


def test_ray_pool_sampling_trains(tiny_npz, tmp_path):
    """--ray-sampling pool (cross-image batching, full-NeRF style)
    learns end to end; bogus values are rejected."""
    from tinynerf_tpu import train

    cfg = _cfg(tiny_npz, tmp_path, ray_sampling="pool", holdout=2)
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])
    assert res["eval"]["psnr_mean"] > 5

    with pytest.raises(ValueError, match="ray_sampling"):
        train.main(_cfg(tiny_npz, tmp_path, ray_sampling="bogus"))


def test_ndc_forward_facing_end_to_end(tmp_path):
    """--ndc on an LLFF-style forward-facing scene: rays reproject to
    NDC, training learns (loss drops), and the GIF consumer rebuilds
    the NDC renderer from the checkpoint meta (VERDICT r2 item 7 —
    ndc_rays wired end to end, not an orphan op)."""
    from tinynerf_tpu import make_gif, train

    d = generate_synthetic_dataset(n_poses=6, h=24, w=24, forward_facing=True)
    path = str(tmp_path / "ff.npz")
    np.savez(path, images=d["images"], poses=d["poses"], focal=d["focal"])

    cfg = _cfg(path, tmp_path, ndc=True, iters=60, holdout=2)
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])
    # The scene is learnable through NDC: held-out eval must beat the
    # random-init band (~8-10 dB on this scene) after 60 tiny steps.
    assert res["eval"]["psnr_mean"] > 10, res["eval"]

    gcfg = make_gif.GifConfig(
        ckpt_path=cfg.ckpt_path,
        data_path=path,
        out_path=str(tmp_path / "ndc.gif"),
        n_frames=3,
        n_samples=8,
        chunk=128,
    )
    make_gif.main(gcfg)
    assert os.path.exists(gcfg.out_path)


def test_ndc_vs_world_same_scene_quality(tmp_path):
    """On a forward-facing scene, NDC training must reach comparable
    quality to world-space training (it is a reparameterization, not an
    approximation)."""
    from tinynerf_tpu import train

    d = generate_synthetic_dataset(n_poses=5, h=24, w=24, forward_facing=True)
    path = str(tmp_path / "ff2.npz")
    np.savez(path, images=d["images"], poses=d["poses"], focal=d["focal"])

    res_world = train.main(
        _cfg(path, tmp_path, iters=80, ckpt_path=str(tmp_path / "w.npz"))
    )
    res_ndc = train.main(
        _cfg(path, tmp_path, ndc=True, iters=80, ckpt_path=str(tmp_path / "n.npz"))
    )
    # Both learn; NDC within a loose band of world-space (tiny run).
    assert res_ndc["eval"]["psnr_mean"] > res_world["eval"]["psnr_mean"] - 4.0


def test_eval_cli_from_checkpoint(tiny_npz, tmp_path):
    from tinynerf_tpu import eval as eval_mod, train

    cfg = _cfg(tiny_npz, tmp_path, iters=20, preview_every=20, ckpt_every=20)
    train.main(cfg)
    ecfg = eval_mod.EvalConfig(
        ckpt_path=cfg.ckpt_path,
        data_path=tiny_npz,
        out_dir=str(tmp_path / "eval"),
        views=3,
        n_samples=8,
        chunk=128,
        save_images=True,
    )
    res = eval_mod.main(ecfg)
    assert np.isfinite(res["psnr_mean"]) and 0 <= res["ssim_mean"] <= 1
    assert os.path.exists(str(tmp_path / "eval" / "metrics.json"))


def test_strided_holdout_and_eval_curve(tiny_npz, tmp_path):
    """Pose-diverse holdout + the periodic held-out eval curve
    (VERDICT r3 item 2): strided mode reorders the capture so held-out
    poses sit at the tail; --eval-every logs held-out rows mid-run."""
    import json

    from tinynerf_tpu import train

    metrics = str(tmp_path / "metrics.jsonl")
    cfg = _cfg(
        tiny_npz, tmp_path, holdout=2, holdout_mode="strided",
        eval_every=20, metrics_path=metrics,
    )
    res = train.main(cfg)
    assert np.isfinite(res["eval"]["psnr_mean"])
    rows = [json.loads(l) for l in open(metrics)]
    curve = [r for r in rows if r.get("kind") == "held-out" and "step" in r]
    # iters=40, eval_every=20 -> held-out scores at steps 20 and 40.
    assert [r["step"] for r in curve] == [20, 40], curve
    for r in curve:
        assert np.isfinite(r["eval"]["psnr_mean"])


def test_strided_holdout_holds_out_diverse_poses(tiny_npz, tmp_path):
    """The held-out tail after reordering must be the evenly spaced
    original poses (first and last of the capture for holdout=2), and
    training must not see them."""
    from tinynerf_tpu import train
    from tinynerf_tpu.data import ensure_data

    d = ensure_data(tiny_npz, allow_synthetic=False)
    cfg = _cfg(tiny_npz, tmp_path, iters=20, holdout=2, holdout_mode="strided")
    res = train.main(cfg)
    # 6 poses, holdout 2 strided -> original indices 0 and 5 held out.
    # The final eval ran over exactly those (reordered to the tail).
    assert len(res["eval"]["per_view"]) == 2


def test_eval_every_without_holdout_rejected(tiny_npz, tmp_path):
    from tinynerf_tpu import train

    cfg = _cfg(tiny_npz, tmp_path, eval_every=10, holdout=0)
    with pytest.raises(ValueError, match="eval-every"):
        train.main(cfg)


def test_weight_decay_and_lr_floor_train(tiny_npz, tmp_path):
    """The anti-memorization levers train end to end and stay finite."""
    from tinynerf_tpu import train

    cfg = _cfg(
        tiny_npz, tmp_path, weight_decay=1e-3, lr_decay_steps=20,
        lr_floor=1e-4, sigma_noise_std=0.5, sigma_noise_decay_steps=10,
        sigma_noise_floor=0.1, ray_sampling="pool",
    )
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])


def test_eval_holdout_views_strided_ckpt(tiny_npz, tmp_path):
    """--holdout-views evaluates the poses the checkpoint recorded as
    held out — with strided training a tail slice would silently score
    TRAINED views (code-review r4 finding)."""
    from tinynerf_tpu import eval as eval_mod, train

    cfg = _cfg(tiny_npz, tmp_path, iters=20, holdout=2, holdout_mode="strided")
    train.main(cfg)
    ecfg = eval_mod.EvalConfig(
        ckpt_path=cfg.ckpt_path, data_path=tiny_npz,
        out_dir=str(tmp_path / "ho_eval"), holdout_views=True,
        n_samples=8, chunk=128, save_images=False,
    )
    res = eval_mod.main(ecfg)
    import json

    idx = json.load(open(str(tmp_path / "ho_eval" / "metrics.json")))["indices"]
    # 6 poses, strided holdout 2 -> original poses 0 and 5.
    assert idx == [0, 5], idx
    assert np.isfinite(res["psnr_mean"])


def test_eval_holdout_views_requires_metadata(tiny_npz, tmp_path):
    from tinynerf_tpu import eval as eval_mod, train

    cfg = _cfg(tiny_npz, tmp_path, iters=20, holdout=0)
    train.main(cfg)
    ecfg = eval_mod.EvalConfig(
        ckpt_path=cfg.ckpt_path, data_path=tiny_npz,
        out_dir=str(tmp_path / "x"), holdout_views=True,
        n_samples=8, chunk=128, save_images=False,
    )
    with pytest.raises(ValueError, match="holdout"):
        eval_mod.main(ecfg)


def test_ema_twin_checkpoint_and_eval(tiny_npz, tmp_path):
    """--ema-decay: the Polyak average is scored alongside raw weights
    at every held-out eval and checkpointed as <ckpt>.ema.npz in the
    standard schema (any render consumer loads it directly)."""
    import json

    from tinynerf_tpu import eval as eval_mod, train

    metrics = str(tmp_path / "m.jsonl")
    cfg = _cfg(
        tiny_npz, tmp_path, holdout=2, eval_every=20, ema_decay=0.9,
        metrics_path=metrics,
    )
    res = train.main(cfg)
    assert res["eval_ema"] is not None
    assert np.isfinite(res["eval_ema"]["psnr_mean"])
    rows = [json.loads(l) for l in open(metrics)]
    mid = [r for r in rows if r.get("kind") == "held-out" and r.get("step") == 20]
    assert mid and mid[0].get("eval_ema"), mid
    ema_path = cfg.ckpt_path + ".ema.npz"
    assert os.path.exists(ema_path)
    ecfg = eval_mod.EvalConfig(
        ckpt_path=ema_path, data_path=tiny_npz, out_dir=str(tmp_path / "e"),
        views=2, n_samples=8, chunk=128, save_images=False,
    )
    r = eval_mod.main(ecfg)
    assert np.isfinite(r["psnr_mean"])
    # `--ema` sugar: same twin via the RAW ckpt path (VERDICT r4 item 6
    # — the best-performing lever was unscoreable at all-views scale).
    r2 = eval_mod.main(
        eval_mod.EvalConfig(
            ckpt_path=cfg.ckpt_path, ema=True, data_path=tiny_npz,
            out_dir=str(tmp_path / "e2"), views=2, n_samples=8, chunk=128,
            save_images=False,
        )
    )
    assert r2["psnr_mean"] == r["psnr_mean"]


def test_eval_ema_without_twin_fails_loud(tiny_npz, tmp_path):
    import pytest

    from tinynerf_tpu import eval as eval_mod, train

    cfg = _cfg(tiny_npz, tmp_path, iters=20)  # no --ema-decay: no twin
    train.main(cfg)
    with pytest.raises(FileNotFoundError, match="ema"):
        eval_mod.main(
            eval_mod.EvalConfig(
                ckpt_path=cfg.ckpt_path, ema=True, data_path=tiny_npz,
                out_dir=str(tmp_path / "e3"), views=1, n_samples=8,
                chunk=128, save_images=False,
            )
        )


def test_eval_error_maps(tiny_npz, tmp_path):
    from tinynerf_tpu import eval as eval_mod, train

    cfg = _cfg(tiny_npz, tmp_path, iters=20)
    train.main(cfg)
    ecfg = eval_mod.EvalConfig(
        ckpt_path=cfg.ckpt_path, data_path=tiny_npz,
        out_dir=str(tmp_path / "em"), views=2, n_samples=8, chunk=128,
        save_images=False, save_error_maps=True,
    )
    eval_mod.main(ecfg)
    import glob

    errs = glob.glob(str(tmp_path / "em" / "err_*.png"))
    assert len(errs) == 2, errs


def test_sigma_sparsity_trains_all_paths(tiny_npz, tmp_path):
    """--sigma-sparsity composes with the default, nerf, and occupancy
    paths end to end; rejects the sharded hierarchical path."""
    from tinynerf_tpu import train

    for extra in (
        {},
        {"model": "nerf", "n_fine": 8},
        {"model": "nerf", "n_fine": 8, "proposal": "occupancy"},
    ):
        cfg = _cfg(
            tiny_npz, tmp_path, iters=20, sigma_sparsity=1e-3,
            sigma_sparsity_points=128,
            ckpt_path=str(tmp_path / f"ck_{len(extra)}.npz"), **extra,
        )
        res = train.main(cfg)
        assert np.isfinite(res["final_psnr"]), extra

    # Sharded path: extra_grad_fn is added post-pmean from the shared
    # key, so the sharded run stays replicated and trains finitely.
    if jax.device_count() > 1:
        cfg = _cfg(
            tiny_npz, tmp_path, iters=20, sigma_sparsity=1e-3,
            sigma_sparsity_points=128, data_parallel=True,
            ckpt_path=str(tmp_path / "ck_dp.npz"),
        )
        res = train.main(cfg)
        assert np.isfinite(res["final_psnr"])


def test_sigma_death_watchdog_aborts(tiny_npz, tmp_path):
    """A run pinned at the background floor must abort with rc 3, a
    saved checkpoint, and a sigma_death metrics row (VERDICT r4 weak #3:
    r4's hard legs burned 15k+ steps rendering pure white with nothing
    watching the curve). Forced here via an everything-is-pinned margin."""
    import json

    from tinynerf_tpu import train

    metrics = str(tmp_path / "m.jsonl")
    cfg = _cfg(
        tiny_npz, tmp_path, iters=40, metrics_path=metrics,
        death_margin=100.0, death_window=1, death_grace=0,
    )
    with pytest.raises(SystemExit) as ei:
        train.main(cfg)
    assert ei.value.code == 3
    assert os.path.exists(cfg.ckpt_path)  # postmortem checkpoint saved
    rows = [json.loads(l) for l in open(metrics)]
    dead = [r for r in rows if r.get("sigma_death")]
    assert dead and "bg_psnr" in dead[0]


def test_death_check_disabled(tiny_npz, tmp_path):
    from tinynerf_tpu import train

    cfg = _cfg(
        tiny_npz, tmp_path, iters=20, death_check=False,
        death_margin=100.0, death_window=1, death_grace=0,
    )
    res = train.main(cfg)  # completes despite the absurd margin
    assert np.isfinite(res["final_psnr"])


def test_precrop_trains_end_to_end(tiny_npz, tmp_path):
    """--precrop-iters: warmup-cropped run completes and learns."""
    from tinynerf_tpu import train

    cfg = _cfg(tiny_npz, tmp_path, iters=30, precrop_iters=10,
               precrop_frac=0.5)
    res = train.main(cfg)
    assert np.isfinite(res["final_psnr"])
