"""Regression net for the driver-invoked __graft_entry__ contract.

The round driver compile-checks `entry()` single-chip and executes
`dryrun_multichip(n)` on a virtual n-device CPU mesh to produce the
round's MULTICHIP artifact. Nothing else in the suite imports
__graft_entry__, so a training-stack change (optimizer state schema,
kernel signature, mesh helper) can break the driver artifact silently.
Run it exactly as the driver does: a fresh subprocess with the forced
CPU platform (the in-process test backend is already initialized with
8 devices, but the dryrun must also work from a cold start, where it
configures the platform itself).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_executes_all_layouts():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    proc = subprocess.run(
        [sys.executable, "-u", "__graft_entry__.py", "--dryrun", "8"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"dryrun rc={proc.returncode}\nstdout: {proc.stdout[-3000:]}\n"
        f"stderr: {proc.stderr[-3000:]}"
    )
    # One OK line per layout; a silently skipped layout is a failure.
    for layout in (
        "mesh={'data': 4, 'sample': 2} steps=2",
        "hierarchical nerf",
        "fused-kernel DP",
        "fused block-partials nerf",
        "occupancy-proposal DP",
    ):
        assert layout in proc.stdout, (
            f"layout missing from dryrun output: {layout}\n{proc.stdout}"
        )
    assert proc.stdout.count(" OK") >= 5, proc.stdout
