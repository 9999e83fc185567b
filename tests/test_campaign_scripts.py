"""Flag-surface smoke test for the round-4 on-chip campaign scripts.

The campaign (`benchmarks/run_r4.sh` and its stages) is queued behind a
TPU tunnel outage and will launch unattended (scripts/
campaign_on_tpu_up.sh). A single stale flag in one of those scripts
would burn the whole TPU window, so this test executes every campaign
script with a stubbed `python` that records each argv, then
parse-validates the recorded commands against the REAL Config
dataclasses (tinynerf_tpu.config.Config, EvalConfig, GifConfig,
GenConfig). Nothing trains; this is argv capture + argparse only.

The reference has no analog (no scripts beyond scripts/get_data.sh and
no tests at all — SURVEY.md section 4); this is framework-side
infrastructure for unattended hardware campaigns.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAMPAIGN_SCRIPTS = [
    "benchmarks/run_r4.sh",  # master runner (invokes the stages below)
    "benchmarks/occupancy_r4.sh",
    "benchmarks/ndc_quality_r4.sh",
    "benchmarks/hardscene_r4.sh",
    "benchmarks/heldout_levers_r4.sh",
    "benchmarks/flagship80k_r4.sh",
    "benchmarks/grid_r4.sh",  # post-campaign grid-family legs
    # hardfix_r4.sh became a no-op stub in round 5 (its question moved
    # to the hardscene_r5 probe loop) — nothing to record there.
    "benchmarks/run_r5.sh",  # round-5 master runner
    "benchmarks/hardscene_r5.sh",
    "benchmarks/flagship_r5.sh",
    "benchmarks/gridreg_r5.sh",
]

PYTHON_STUB = """#!/usr/bin/env bash
# Records argv as a JSON line and exits 0 (no training in tests).
# -S skips site initialization: the sandbox's sitecustomize pre-imports
# jax (axon plugin discovery, seconds per process — minutes across the
# ~40 recorded commands when the tunnel is flaky); the recorder only
# needs the stdlib.
real_python=%(real_python)s
"$real_python" -S - "$@" <<'EOF'
import json, os, sys
with open(os.environ["ARGV_LOG"], "a") as f:
    f.write(json.dumps(sys.argv[1:]) + "\\n")
EOF
"""

TIMEOUT_STUB = """#!/usr/bin/env bash
# Drop the duration; exec the command so the python stub intercepts.
shift
exec "$@"
"""


def capture_campaign_commands(tmp):
    """Run every campaign script with stubbed python/timeout; return
    {script: [argv, ...]} of recorded python invocations. Shared with
    test_campaign_rehearsal.py (which re-runs the captured train legs
    at micro scale)."""
    stub_bin = tmp / "bin"
    stub_bin.mkdir()
    (stub_bin / "python").write_text(
        PYTHON_STUB % {"real_python": json.dumps(sys.executable)}
    )
    (stub_bin / "timeout").write_text(TIMEOUT_STUB)
    for f in ("python", "timeout"):
        os.chmod(stub_bin / f, 0o755)

    out = {}
    for script in CAMPAIGN_SCRIPTS:
        # Isolated cwd so scripts' mkdir/log redirections never touch
        # the repo; nested `bash benchmarks/<stage>.sh` calls need the
        # stage scripts present at the same relative path.
        cwd = tmp / os.path.basename(script).replace(".sh", "")
        (cwd / "benchmarks").mkdir(parents=True)
        for src in os.listdir(os.path.join(REPO, "benchmarks")):
            if src.endswith(".sh"):
                shutil.copy(
                    os.path.join(REPO, "benchmarks", src),
                    cwd / "benchmarks" / src,
                )
        argv_log = cwd / "argv.jsonl"
        env = dict(
            os.environ,
            PATH=f"{stub_bin}:{os.environ['PATH']}",
            ARGV_LOG=str(argv_log),
        )
        proc = subprocess.run(
            ["bash", os.path.join(REPO, script)],
            cwd=cwd,
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert proc.returncode == 0, (
            f"{script} exited rc={proc.returncode}\n"
            f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
        )
        lines = (
            argv_log.read_text().splitlines() if argv_log.exists() else []
        )
        out[script] = [json.loads(ln) for ln in lines]
    return out


@pytest.fixture(scope="module")
def recorded_commands(tmp_path_factory):
    return capture_campaign_commands(tmp_path_factory.mktemp("campaign"))


def _classify(argv):
    """Return (kind, flags) for a recorded python argv."""
    args = [a for a in argv if a != "-u"]
    if args[:1] == ["-m"]:
        return args[1], args[2:]
    return ("script", args)  # plain `python path/to/file.py ...`


def _parse_with(config_cls, flags, context):
    from tinynerf_tpu.utils.cli import cli

    try:
        return cli(config_cls, args=flags)
    except SystemExit as e:  # argparse error (unknown/malformed flag)
        pytest.fail(
            f"campaign command failed to parse against "
            f"{config_cls.__name__}: {context}\nflags: {flags} (rc={e.code})"
        )


def test_scripts_exist_and_record_commands(recorded_commands):
    for script, cmds in recorded_commands.items():
        assert cmds, f"{script} recorded no python invocations"
    # The master runner reaches every stage: bench + tile sweep + all
    # nested stage commands. A silent early exit shows up as a low count.
    master = recorded_commands["benchmarks/run_r4.sh"]
    assert len(master) >= 20, (
        f"run_r4.sh recorded only {len(master)} commands — a stage is "
        f"silently exiting early: {[c[:3] for c in master]}"
    )
    # r5 master: bench + hard gen/probes + flagship trains/evals + grid
    # profile + gridreg + collect (the winner-20k leg is data-dependent
    # and records only when a probe artifact exists).
    master5 = recorded_commands["benchmarks/run_r5.sh"]
    assert len(master5) >= 14, (
        f"run_r5.sh recorded only {len(master5)} commands — a stage is "
        f"silently exiting early: {[c[:3] for c in master5]}"
    )


def test_every_command_parses_against_real_configs(recorded_commands):
    from tinynerf_tpu.config import Config
    from tinynerf_tpu.eval import EvalConfig
    from tinynerf_tpu.make_gif import GifConfig
    from tinynerf_tpu.synthetic import GenConfig

    config_for = {
        "tinynerf_tpu.train": Config,
        "tinynerf_tpu.eval": EvalConfig,
        "tinynerf_tpu.make_gif": GifConfig,
        "tinynerf_tpu.synthetic": GenConfig,
    }
    n_parsed = 0
    for script, cmds in recorded_commands.items():
        for argv in cmds:
            kind, flags = _classify(argv)
            if kind == "script":
                # `python bench.py` / `python benchmarks/foo.py`: the
                # file must exist in the repo.
                path = flags[0]
                assert os.path.exists(os.path.join(REPO, path)), (
                    f"{script} invokes missing file {path}"
                )
                continue
            assert kind in config_for, (
                f"{script} invokes unknown module {kind}: {argv}"
            )
            _parse_with(config_for[kind], flags, f"{script}: {argv}")
            n_parsed += 1
    assert n_parsed >= 15, f"expected >=15 module commands, got {n_parsed}"


def test_train_legs_use_heldout_eval_and_metrics(recorded_commands):
    """Every 20k+ training leg in the campaign must log a metrics
    JSONL (the round-4 evidence collector reads it) and write to a
    non-default checkpoint path (legs would otherwise clobber each
    other when run back to back in one campaign)."""
    from tinynerf_tpu.config import Config
    from tinynerf_tpu.utils.cli import cli

    long_legs = []
    for script, cmds in recorded_commands.items():
        if script in ("benchmarks/run_r4.sh", "benchmarks/run_r5.sh"):
            continue  # nested copies already checked via their own script
        for argv in cmds:
            kind, flags = _classify(argv)
            if kind != "tinynerf_tpu.train":
                continue
            cfg = cli(Config, args=flags)
            if cfg.iters >= 20000:
                long_legs.append((script, cfg))
    assert long_legs, "no long training legs recorded"
    for script, cfg in long_legs:
        assert cfg.metrics_path, f"{script}: long leg missing --metrics-path"
        assert cfg.ckpt_path != "checkpoints/tinynerf.npz", (
            f"{script}: long leg uses the default ckpt path (collision)"
        )
