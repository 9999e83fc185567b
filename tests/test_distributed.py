"""Multi-host bootstrap: 2-process CPU jax.distributed test.

The reference has no distributed layer (SURVEY.md section 2); this
framework scales out via jax.distributed.initialize + the same
shard_map programs spanning DCN. No multi-host slice exists in the
sandbox, so this exercises the REAL bootstrap path with two local CPU
processes talking to a real coordinator, and a cross-process psum —
the minimal proof that parallel/mesh.initialize_distributed wires a
working multi-process runtime (it used to swallow every exception and
no-op; a regression back to that fails these tests).
"""

import os
import socket
import subprocess
import sys

import pytest

from tinynerf_tpu.parallel.mesh import initialize_distributed

_WORKER = r"""
import sys
import jax
from tinynerf_tpu.parallel.mesh import initialize_distributed

addr, pid = sys.argv[1], int(sys.argv[2])
ok = initialize_distributed(
    coordinator_address=addr, num_processes=2, process_id=pid,
    local_device_ids=[0],
)
assert ok, "initialize_distributed returned False with explicit args"
assert jax.process_count() == 2, jax.process_count()
import jax.numpy as jnp
out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
    jnp.ones((jax.local_device_count(),))
)
print("PSUM", float(out[0]), "DEVICES", jax.device_count(), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_single_process_detection():
    """No args, no coordinator env -> explicit False, never an
    exception-swallowing no-op."""
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        assert not os.environ.get(var), f"test needs {var} unset"
    assert initialize_distributed() is False


def test_no_cluster_valueerror_returns_false(monkeypatch):
    """The known 'no cluster detected' ValueError (mentions
    coordinator_address) means a plain single-process run -> False."""
    import jax

    def fake_init(**kwargs):
        raise ValueError(
            "Please specify coordinator_address, num_processes and "
            "process_id, or ensure these are inferable from the environment."
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    assert initialize_distributed() is False


def test_reworded_valueerror_raises_with_note(monkeypatch):
    """A ValueError that does NOT match the validated jax message must
    propagate (never silently fall back to single-process), carrying a
    note pointing at the heuristic (ADVICE r3)."""
    import jax

    def fake_init(**kwargs):
        raise ValueError("some future jax rewording of the bootstrap error")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    with pytest.raises(ValueError) as ei:
        initialize_distributed()
    notes = getattr(ei.value, "__notes__", [])
    assert any("parallel/mesh.py" in n for n in notes), notes


@pytest.mark.slow
def test_two_process_cpu_psum():
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONSTARTUP", None)
    # One CPU device per process (conftest's 8-device XLA_FLAGS would
    # otherwise give a 16-rank gloo world here).
    env.pop("XLA_FLAGS", None)
    # The sandbox's axon sitecustomize initializes jax backends at
    # interpreter start, which would freeze the (single-)process config
    # before jax.distributed.initialize can run — strip it so the
    # worker controls its own bootstrap order (as a real launcher does).
    other = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([os.getcwd()] + other)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        # Each process sums 1.0 over a global axis spanning both.
        assert "PSUM 2.0 DEVICES 2" in out, f"process {i} output:\n{out}"
