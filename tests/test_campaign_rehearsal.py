"""Dynamic micro-scale rehearsal of every distinct round-4 campaign leg.

test_campaign_scripts.py proves each queued command *parses*; this file
proves each distinct flag COMBINATION *runs*. The campaign stacks levers
that the per-lever driver tests exercise only in isolation (e.g.
combo40k = weight-decay + sigma-noise-floor + EMA + sigma-sparsity +
lr-floor, all on top of the fused hierarchical NeRF with pool sampling)
— an interaction bug there would surface for the first time on the real
chip and burn an unattended TPU window (the campaign launches via
scripts/campaign_supervisor.sh whenever the tunnel returns).

Method: capture the real argv of every train leg from the campaign
scripts (shared stub harness), dedupe by flag-name set, re-parse each
against the real Config, then shrink ONLY scale knobs (iters, widths,
sample counts, dataset) and run train.main + the paired eval.main
in-process on CPU. Flag semantics and composition are untouched.

The reference has no analog (no tests, no campaign infrastructure —
SURVEY.md section 4).
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
import pytest

from test_campaign_scripts import _classify, capture_campaign_commands

from tinynerf_tpu.config import Config
from tinynerf_tpu.synthetic import generate_synthetic_dataset
from tinynerf_tpu.utils.cli import cli


@pytest.fixture(scope="module")
def micro_scenes(tmp_path_factory):
    """Tiny orbit + forward-facing captures on disk (npz schema)."""
    root = tmp_path_factory.mktemp("scenes")
    orbit = generate_synthetic_dataset(n_poses=6, h=24, w=24, seed=5)
    orbit_path = str(root / "orbit.npz")
    np.savez(
        orbit_path, images=orbit["images"], poses=orbit["poses"],
        focal=orbit["focal"],
    )
    ff = generate_synthetic_dataset(
        n_poses=6, h=24, w=24, seed=5, forward_facing=True
    )
    ff_path = str(root / "ff.npz")
    np.savez(ff_path, images=ff["images"], poses=ff["poses"], focal=ff["focal"])
    return {"orbit": orbit_path, "ff": ff_path}


@pytest.fixture(scope="module")
def campaign_train_legs(tmp_path_factory):
    """[(leg_name, Config-as-parsed)] — one entry per distinct flag-name
    set across every campaign stage script."""
    cmds = capture_campaign_commands(tmp_path_factory.mktemp("capture"))
    legs, seen = [], set()
    for script, argvs in sorted(cmds.items()):
        if script in ("benchmarks/run_r4.sh", "benchmarks/run_r5.sh"):
            continue  # nested copies of the stage scripts' own commands
        for argv in argvs:
            kind, flags = _classify(argv)
            if kind != "tinynerf_tpu.train":
                continue
            names = tuple(sorted(f for f in flags if f.startswith("--")))
            if names in seen:
                continue
            seen.add(names)
            cfg = cli(Config, args=flags)
            # Leg name from the campaign's own checkpoint naming.
            name = os.path.basename(cfg.ckpt_path).replace(".npz", "")
            legs.append((name, cfg))
    return legs


def _shrink(cfg: Config, scenes, tmp, name: str) -> Config:
    """Scale knobs only — every behavioral flag rides through as the
    campaign set it."""
    kw = dict(
        data_path=scenes["ff" if cfg.ndc else "orbit"],
        allow_synthetic=False,
        iters=16,
        n_rand=64,
        n_samples=8,
        n_fine=8 if cfg.n_fine else 0,
        hidden=16,
        rgb_hidden=16,
        num_freqs=4,
        log_every=8,
        preview_every=1000,
        ckpt_every=16,
        chunk=128,
        bf16=False,
        ckpt_path=str(tmp / f"{name}.npz"),
        out_dir=str(tmp / name),
        metrics_path=str(tmp / f"{name}.jsonl"),
        holdout=min(cfg.holdout, 2),
    )
    if cfg.lr_decay_steps:
        kw["lr_decay_steps"] = 16
    if cfg.sigma_noise_decay_steps:
        kw["sigma_noise_decay_steps"] = 8
    if cfg.eval_every:
        kw["eval_every"] = 8
    if cfg.sigma_sparsity:
        kw["sigma_sparsity_points"] = 128
    if cfg.model == "grid":
        kw.update(
            grid_levels=2, grid_base_res=4, grid_max_res=8,
            grid_table_size=256, grid_hidden=8,
        )
    return dataclasses.replace(cfg, **kw)


def test_every_distinct_leg_trains_and_evals(
    campaign_train_legs, micro_scenes, tmp_path
):
    from tinynerf_tpu import train

    assert len(campaign_train_legs) >= 10, (
        f"expected the campaign to contain >=10 distinct leg structures, "
        f"captured {len(campaign_train_legs)}: "
        f"{[n for n, _ in campaign_train_legs]}"
    )
    failures = []
    for name, raw_cfg in campaign_train_legs:
        cfg = _shrink(raw_cfg, micro_scenes, tmp_path, name)
        try:
            res = train.main(cfg)
            assert np.isfinite(res["final_psnr"]), res["final_psnr"]
            assert os.path.exists(cfg.ckpt_path), "no checkpoint written"
            if cfg.holdout:
                assert res["eval"] and np.isfinite(res["eval"]["psnr_mean"])
            if cfg.eval_every:
                rows = [
                    json.loads(ln)
                    for ln in open(cfg.metrics_path)
                    if ln.strip()
                ]
                assert any("eval" in r for r in rows), (
                    "eval_every set but no held-out curve rows in metrics"
                )
            if cfg.ema_decay:
                assert os.path.exists(cfg.ckpt_path + ".ema.npz")
        except Exception as e:  # noqa: BLE001 — report every broken leg
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "campaign legs failed micro-rehearsal:\n" + "\n".join(
        failures
    )


def test_eval_rehearsal_on_occupancy_and_ctrl_ckpts(
    campaign_train_legs, micro_scenes, tmp_path
):
    """The campaign's eval commands (--views 0, metadata-driven model
    rebuild) against checkpoints from the trickiest restore paths:
    the occupancy proposal (AABB + n_fine meta) and the plain control."""
    from tinynerf_tpu import eval as eval_mod
    from tinynerf_tpu import train

    by_kind = {}
    for name, raw_cfg in campaign_train_legs:
        if raw_cfg.proposal == "occupancy" and "occ" not in by_kind:
            by_kind["occ"] = (name, raw_cfg)
        if (
            raw_cfg.proposal != "occupancy"
            and not raw_cfg.ndc
            and "ctrl" not in by_kind
        ):
            by_kind["ctrl"] = (name, raw_cfg)
    assert set(by_kind) == {"occ", "ctrl"}, by_kind
    for kind, (name, raw_cfg) in sorted(by_kind.items()):
        cfg = _shrink(raw_cfg, micro_scenes, tmp_path, f"evalprep_{name}")
        train.main(cfg)
        out_dir = str(tmp_path / f"eval_{name}")
        ecfg = eval_mod.EvalConfig(
            ckpt_path=cfg.ckpt_path,
            data_path=cfg.data_path,
            allow_synthetic=False,
            out_dir=out_dir,
            views=0,
            n_samples=cfg.n_samples,
            chunk=128,
            save_images=False,
        )
        eval_mod.main(ecfg)
        metrics = json.load(open(os.path.join(out_dir, "metrics.json")))
        assert np.isfinite(metrics["psnr_mean"]), (kind, metrics)
