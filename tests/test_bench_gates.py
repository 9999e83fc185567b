"""bench.py's compiled parity-gate harness, exercised on the CPU
backend (kernels auto-interpret) at small sizes — so gate-harness bugs
(donated buffers, 0/0 cosine metrics, threshold conditioning) surface
in CI rather than on the first on-chip bench run of a round (which is
exactly how two of them were found in round 3)."""

import sys

import numpy as np


def test_compiled_parity_gates_cpu_smoke():
    sys.path.insert(0, ".")
    from bench import _compiled_parity_gates
    from tinynerf_tpu.config import Config
    from tinynerf_tpu.models.nerf import NeRFConfig

    import jax.numpy as jnp

    # f32 compute: the CPU backend has no bf16 dot kernels (the gates
    # run bf16 on the real chip).
    cfg = Config(n_rand=128, bf16=False)
    settings = cfg.train_settings()
    ncfg = NeRFConfig(compute_dtype=jnp.float32)
    out = _compiled_parity_gates(
        settings, cfg, ncfg, R=256, Rg=128, S=32, sample_block=16
    )

    for k in (
        "parity_render_max_err_tinynerf",
        "parity_render_p999_err_tinynerf",
        "parity_render_mean_err_tinynerf",
        "parity_render_flip_frac_tinynerf",
        "parity_grad_cos_tinynerf",
        "parity_grad_cos_nerf",
        "parity_grad_cos_nerf_stream_s512",
        "parity_grad_cos_nerf_partials_s512",
        "parity_loss_relerr_nerf_partials_s512",
        "parity_loss_relerr_nerf_stream_s512",
        "parity_ok",
    ):
        assert k in out, k
        if k != "parity_ok":
            assert np.isfinite(out[k]), (k, out[k])

    # On one backend (both sides interpret/XLA with identical math) the
    # gates must pass comfortably — a failure here is a harness bug or
    # a genuine kernel-semantics drift, both of which CI should catch.
    assert out["parity_ok"] is True, out
    # The peeled-variant gate (round 4) rides the same oracle and must
    # also pass on CPU; its failure mode is isolated from parity_ok.
    assert out["parity_peel_ok"] is True, out


def test_wait_campaign_lock(tmp_path, monkeypatch):
    """bench waits while the campaign lock exists, proceeds when it
    clears, and gives up (but proceeds) at the bound; the campaign's
    own bench stage skips via env."""
    import threading
    import time as _time

    sys.path.insert(0, ".")
    from bench import _wait_campaign_lock

    lock = tmp_path / "CAMPAIGN_RUNNING"

    # No lock: returns immediately, not held.
    waited, held = _wait_campaign_lock(str(lock), wait_s=5, poll_s=0.05)
    assert waited < 1 and not held

    # Lock present, removed by "the campaign" shortly: wait ends early.
    lock.touch()
    threading.Timer(0.3, lock.unlink).start()
    waited, held = _wait_campaign_lock(str(lock), wait_s=30, poll_s=0.05)
    assert 0.2 < waited < 5 and not held

    # Lock never clears: bounded give-up, reported as still held.
    lock.touch()
    t0 = _time.time()
    _, held = _wait_campaign_lock(str(lock), wait_s=0.3, poll_s=0.05)
    assert _time.time() - t0 < 5 and held

    # Stale lock (recorded holder pid is dead): cleared, not held.
    # A spawned-and-reaped child's pid is certainly dead.
    import subprocess

    child = subprocess.Popen(["true"])
    child.wait()
    lock.write_text(str(child.pid))
    waited, held = _wait_campaign_lock(str(lock), wait_s=30, poll_s=0.05)
    assert waited < 5 and not held
    assert not lock.exists()

    # Campaign's own bench invocation skips the wait entirely.
    lock.touch()
    monkeypatch.setenv("BENCH_SKIP_CAMPAIGN_LOCK", "1")
    assert _wait_campaign_lock(str(lock), wait_s=30, poll_s=0.05) == (0.0, False)


def test_reuse_campaign_bench_artifact(tmp_path):
    """When the campaign holds the chip past the bounded wait, the
    driver bench replays the campaign's own stage-1 artifact (same
    code/chip/round) with provenance — or declines if none landed."""
    import json

    sys.path.insert(0, ".")
    from bench import _reuse_campaign_bench_artifact

    log = tmp_path / "bench.log"

    # No log / no artifact line / degraded artifact -> None.
    assert _reuse_campaign_bench_artifact(str(log)) is None
    log.write_text("some\nnoise\n")
    assert _reuse_campaign_bench_artifact(str(log)) is None
    log.write_text(
        '{"metric": "train_rays_per_sec_per_chip", "value": null, '
        '"extras": {"degraded": true}}\n'
    )
    assert _reuse_campaign_bench_artifact(str(log)) is None

    # Healthy artifact -> replayed with provenance stamped.
    art = {
        "metric": "train_rays_per_sec_per_chip",
        "value": 3123456.0,
        "unit": "rays/s",
        "vs_baseline": 880.1,
        "extras": {"degraded": False, "parity_ok": True},
    }
    log.write_text("[bench] noise\n" + json.dumps(art) + "\n")
    out = _reuse_campaign_bench_artifact(str(log))
    assert out is not None
    assert out["value"] == 3123456.0
    assert out["extras"]["reused_from_campaign_stage"] is True
    assert "provenance" in out["extras"]
    assert out["extras"]["parity_ok"] is True


def test_artifact_replayable_predicate():
    """A degraded flag from a failed parity/baseline section must not
    discard a complete throughput measurement (VERDICT r4 weak #1b: a
    driver-grade artifact sat in bench.log while the replay path
    rejected it outright for degraded:true); a failed train_*/render_*
    section or a null headline still blocks the replay."""
    sys.path.insert(0, ".")
    from bench import _artifact_replayable

    ok, failed = _artifact_replayable(
        {"value": 1.0, "extras": {"degraded": False,
                                  "sections": {"train_fused": "ok"}}}
    )
    assert ok and failed == []

    ok, failed = _artifact_replayable(
        {"value": 1.0, "extras": {"degraded": True, "sections": {
            "train_fused": "ok", "render_xla": "ok",
            "parity_gates": "error: remote_compile: response body closed",
        }}}
    )
    assert ok and failed == ["parity_gates"]

    ok, _ = _artifact_replayable(
        {"value": 1.0, "extras": {"degraded": True,
                                  "sections": {"train_fused": "error: x"}}}
    )
    assert not ok
    assert _artifact_replayable({"value": None, "extras": {}})[0] is False


def test_reuse_accepts_parity_degraded_artifact(tmp_path):
    """r4's exact loss mode: both campaign bench passes were degraded
    ONLY by the parity-gates tunnel error; the replay must accept such
    an artifact and stamp which sections failed."""
    import json

    sys.path.insert(0, ".")
    from bench import _reuse_campaign_bench_artifact

    art = {
        "metric": "train_rays_per_sec_per_chip",
        "value": 2990000.0,
        "extras": {
            "degraded": True,
            "sections": {
                "backend_init": "ok",
                "train_xla": "ok",
                "train_fused": "ok",
                "render_xla": "ok",
                "parity_gates": "error: JaxRuntimeError: remote_compile",
            },
        },
    }
    log = tmp_path / "bench.log"
    log.write_text(json.dumps(art) + "\n")
    out = _reuse_campaign_bench_artifact(str(log))
    assert out is not None
    assert out["value"] == 2990000.0
    assert out["extras"]["replayed_with_failed_sections"] == ["parity_gates"]


def test_reuse_prefers_newest_green_line(tmp_path):
    """Multiple artifact lines in one log (two campaign passes): the
    newest REPLAYABLE one wins, skipping a newer null."""
    import json

    sys.path.insert(0, ".")
    from bench import _reuse_campaign_bench_artifact

    green = {"metric": "m", "value": 111.0, "extras": {"degraded": False}}
    null = {"metric": "m", "value": None, "extras": {"degraded": True}}
    log = tmp_path / "bench.log"
    log.write_text(json.dumps(green) + "\n" + json.dumps(null) + "\n")
    out = _reuse_campaign_bench_artifact(str(log))
    assert out is not None and out["value"] == 111.0


def test_bench_main_replays_first_when_round_artifact_exists(
    monkeypatch, capsys
):
    """VERDICT r4 item 1a: when this round's campaign already landed an
    on-chip artifact, main() emits it IMMEDIATELY — before the lock wait
    (which exceeded the driver timeout in r4) and before any tunnel
    contact (which was down at capture time in r3)."""
    import json

    sys.path.insert(0, ".")
    import bench

    replay = {
        "metric": "train_rays_per_sec_per_chip",
        "value": 3200000.0,
        "extras": {"parity_ok": True, "reused_from_campaign_stage": True},
    }
    monkeypatch.setattr(
        bench, "_reuse_campaign_bench_artifact", lambda *a, **k: dict(replay)
    )

    def never(*a, **k):
        raise AssertionError("lock wait reached despite replay-first")

    monkeypatch.setattr(bench, "_wait_campaign_lock", never)
    bench.main()
    art = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert art["value"] == 3200000.0


def test_bench_force_live_skips_replay_first(monkeypatch, capsys):
    """BENCH_FORCE_LIVE=1 (set by the campaign's own bench stage) must
    bypass the replay-first shortcut so a live measurement is taken."""
    sys.path.insert(0, ".")
    import bench

    monkeypatch.setenv("BENCH_FORCE_LIVE", "1")
    calls = []

    def fake_reuse(*a, **k):
        calls.append(k)
        return None

    monkeypatch.setattr(bench, "_reuse_campaign_bench_artifact", fake_reuse)
    monkeypatch.setattr(bench, "_wait_campaign_lock", lambda: (1.0, True))
    bench.main()
    # The replay-first call passes log_paths; with FORCE_LIVE it must
    # never happen — only the lock-held fallback (no-arg) call may.
    assert all("log_paths" not in k for k in calls)


def test_bench_replays_campaign_artifact_when_tunnel_dies_after_campaign(
    monkeypatch, capsys
):
    """Tunnel up mid-round (campaign bench lands on chip), tunnel dead
    at the driver's round-end capture: bench must replay the same-round
    on-chip artifact (with the backend error recorded) instead of
    shipping a null."""
    import json

    sys.path.insert(0, ".")
    import bench

    monkeypatch.setattr(bench, "_wait_campaign_lock", lambda: (0.0, False))

    # Force the live path: replay-first would otherwise emit the
    # artifact before ever touching the backend (the behavior under
    # test here is the backend-failure FALLBACK replay).
    monkeypatch.setenv("BENCH_FORCE_LIVE", "1")

    def dead_probe():
        raise TimeoutError("backend init hung > 420s (tunnel down?)")

    monkeypatch.setattr(bench, "_probe_backend", dead_probe)
    replay = {
        "metric": "train_rays_per_sec_per_chip",
        "value": 3100000.0,
        "extras": {"degraded": False, "parity_ok": True},
    }
    monkeypatch.setattr(
        bench, "_reuse_campaign_bench_artifact", lambda *a, **k: dict(
            replay, extras=dict(replay["extras"])
        )
    )
    bench.main()
    art = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert art["value"] == 3100000.0
    assert "backend_init_at_capture" in art["extras"]
    assert art["extras"]["backend_init_at_capture"].startswith("error:")


def test_bench_main_replays_campaign_artifact_when_lock_held(
    monkeypatch, capsys, tmp_path
):
    """main() with the campaign lock still held: emits the replayed
    stage artifact (never contends for the grant), or an honest
    degraded artifact when no stage artifact exists."""
    import json

    sys.path.insert(0, ".")
    import bench

    monkeypatch.setattr(bench, "_wait_campaign_lock", lambda: (1.0, True))

    # No reusable stage artifact -> degraded, refused to contend.
    monkeypatch.setattr(
        bench, "_reuse_campaign_bench_artifact", lambda *a, **k: None
    )
    bench.main()
    art = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert art["value"] is None
    assert art["extras"]["degraded"] is True
    assert "refused to contend" in art["extras"]["error"]
    assert "campaign_lock" in art["extras"]["sections"]

    # Reusable artifact -> replayed verbatim.
    replay = {
        "metric": "train_rays_per_sec_per_chip",
        "value": 99.0,
        "extras": {"reused_from_campaign_stage": True, "provenance": "x"},
    }
    monkeypatch.setattr(
        bench, "_reuse_campaign_bench_artifact", lambda *a, **k: dict(replay)
    )
    bench.main()
    art = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert art["value"] == 99.0
    assert art["extras"]["reused_from_campaign_stage"] is True


def test_bench_degrades_to_artifact_on_backend_failure(monkeypatch, capsys):
    """Round 3 shipped rc:1 and ZERO bench evidence because the axon
    tunnel died at backend init (BENCH_r03.json). The bench must instead
    retry, then emit a VALID one-line JSON artifact with degraded:true
    (VERDICT r3 item 7)."""
    import json

    sys.path.insert(0, ".")
    import bench

    # A REAL campaign may hold benchmarks/r4/CAMPAIGN_RUNNING while the
    # suite runs (measured: the suite politely queued on the live lock
    # for the full 90-min bound) — the wait is not under test here.
    monkeypatch.setenv("BENCH_SKIP_CAMPAIGN_LOCK", "1")

    def dead_devices():
        raise RuntimeError("Unable to initialize backend 'tpu': connection refused")

    monkeypatch.setattr(bench.jax, "devices", dead_devices)
    monkeypatch.setattr(bench, "_probe_backend", lambda: bench.jax.devices())
    # No campaign artifact to fall back on in this scenario.
    monkeypatch.setattr(
        bench, "_reuse_campaign_bench_artifact", lambda *a, **k: None
    )
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    art = json.loads(line)
    assert art["metric"] == "train_rays_per_sec_per_chip"
    assert art["value"] is None
    assert art["extras"]["degraded"] is True
    assert "backend_init" in art["extras"]["sections"]
    assert art["extras"]["sections"]["backend_init"].startswith("error:")


def test_bench_section_isolation():
    """One failing measurement section degrades the artifact instead of
    killing it: status recorded, other sections still run."""
    sys.path.insert(0, ".")
    from bench import _Sections

    secs = _Sections()
    assert secs.run("good", lambda: 42) == 42
    assert secs.run("bad", lambda: 1 / 0) is None
    assert secs.run("after", lambda: "still runs") == "still runs"
    assert secs.status["good"] == "ok"
    assert secs.status["bad"].startswith("error: ZeroDivisionError")
    assert secs.degraded is True


def test_bench_main_wiring_cpu(monkeypatch, capsys):
    """bench.main()'s restructured section flow, JSON assembly, and
    null-safety — with the heavy measurements stubbed (the real ones
    take ~1s/step on CPU; the TPU driver runs them for real)."""
    import json

    sys.path.insert(0, ".")
    import bench

    # See test_bench_degrades_to_artifact_on_backend_failure: never
    # wait on a LIVE campaign's chip lock from the test suite.
    monkeypatch.setenv("BENCH_SKIP_CAMPAIGN_LOCK", "1")
    # This test exercises the LIVE section flow; without this, a
    # same-round campaign artifact on disk (present whenever the suite
    # runs mid-campaign) short-circuits main() into the replay path.
    monkeypatch.setenv("BENCH_FORCE_LIVE", "1")
    monkeypatch.setattr(
        bench, "_measure_train_rays_per_sec",
        lambda *a, **k: (1e6, 1e-3, {"p50_ms": 1.0, "p95_ms": 1.2, "max_ms": 2.0}),
    )
    monkeypatch.setattr(
        bench, "_measure_render_rays_per_sec", lambda *a, **k: 2e6
    )
    monkeypatch.setattr(bench, "_torch_cpu_baseline", lambda: 500.0)
    # Tiny dataset: the one section left unstubbed (frames-batched
    # render) must run REAL jit/render code, just on 20x20 images.
    from tinynerf_tpu import data as data_mod
    from tinynerf_tpu.synthetic import generate_synthetic_dataset

    tiny = generate_synthetic_dataset(n_poses=3, h=20, w=20)
    monkeypatch.setattr(
        data_mod, "ensure_data", lambda *a, **k: {**tiny, "synthetic": True}
    )
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    art = json.loads(line)
    assert art["value"] == 1e6
    assert art["vs_baseline"] == 2000.0
    ex = art["extras"]
    assert ex["degraded"] is False, ex["sections"]
    assert ex["sections"]["backend_init"] == "ok"
    assert ex["sections"]["train_xla"] == "ok"
    assert ex["sections"]["render_frames_batched"] == "ok"
    # CPU backend: the TPU-only sections must be absent, not errored.
    assert "train_fused" not in ex["sections"]
    assert ex["render_rays_per_sec_frames_batched"] is not None


def test_bench_watchdog_emits_partial_artifact(monkeypatch, capsys):
    """A mid-run hang (silently dying tunnel blocks in np.asarray) must
    still yield a one-line JSON artifact: the watchdog fires, emits the
    sections/partial values collected so far, and exits 0."""
    import json
    import os as os_mod

    sys.path.insert(0, ".")
    import bench

    secs = bench._Sections()
    secs.run("train_xla", lambda: 123456.0)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    exited = {}
    monkeypatch.setattr(os_mod, "_exit", lambda rc: exited.setdefault("rc", rc))
    bench._start_watchdog(secs, deadline_s=0.0)
    import time as time_mod

    for _ in range(100):  # let the daemon thread run
        if exited:
            break
        time_mod.sleep(0.05)
    assert exited.get("rc") == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    art = json.loads(line)
    assert art["extras"]["degraded"] is True
    assert art["extras"]["watchdog_fired_after_s"] == 0.0
    assert art["extras"]["partial_values"]["train_xla"] == 123456.0
    # And once a real emit happened, the watchdog stays silent.
    secs2 = bench._Sections()
    secs2.emitted = True
    bench._start_watchdog(secs2, deadline_s=0.0)
    time_mod.sleep(0.2)
    assert capsys.readouterr().out.strip() == ""


class TestBenchLauncher:
    """The jax-free launcher guard at the top of bench.py: when the
    tunnel is down, `import jax` itself hangs at interpreter start, so
    only a parent that never imports jax can guarantee an artifact."""

    def _stub(self, tmp_path, tail: str) -> str:
        src = open("bench.py").read()
        cut = src.rindex("\nimport jax")  # the real import, not comments
        path = str(tmp_path / "bench_stub.py")
        open(path, "w").write(src[:cut] + "\n" + tail)
        return path

    def test_passthrough(self, tmp_path):
        import json
        import subprocess

        path = self._stub(
            tmp_path,
            'print(\'{"metric": "train_rays_per_sec_per_chip", "value": 42.0}\')\n',
        )
        import os as os_mod

        p = subprocess.run(
            [sys.executable, "-u", path], capture_output=True, text=True,
            timeout=60,
            env=dict(os_mod.environ, BENCH_SKIP_CAMPAIGN_LOCK="1"),
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith('{"metric"')]
        assert p.returncode == 0 and len(lines) == 1, p.stdout
        assert json.loads(lines[0])["value"] == 42.0

    def test_hang_produces_degraded_artifact(self, tmp_path):
        import json
        import os as os_mod
        import subprocess

        path = self._stub(tmp_path, "import time\ntime.sleep(600)\n")
        p = subprocess.run(
            [sys.executable, "-u", path],
            # SKIP_CAMPAIGN_LOCK: a live campaign's lock would extend
            # the launcher deadline by BENCH_LOCK_WAIT_S and the child
            # would outlive the subprocess timeout (measured mid-r4).
            env=dict(
                os_mod.environ,
                BENCH_TOTAL_DEADLINE_S="3",
                BENCH_SKIP_CAMPAIGN_LOCK="1",
            ),
            capture_output=True, text=True, timeout=120,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith('{"metric"')]
        assert p.returncode == 0 and len(lines) == 1, p.stdout
        art = json.loads(lines[0])
        assert art["value"] is None
        assert art["extras"]["degraded"] is True
        assert "launcher" in art["extras"]
