"""Device-mesh construction and sharding helpers.

The reference has no distributed layer (SURVEY.md section 2's explicit
check); the TPU framework scales natively instead: rays are
embarrassingly parallel, so the canonical layout is a 1-D ('data',)
mesh sharding the ray batch with parameters replicated, and an optional
('data', 'sample') 2-D mesh additionally sharding the per-ray sample
axis (the workload's sequence-parallel analog — see
ops/volume.py blockwise composite). Gradients ride ICI via psum;
no NCCL-style backend exists or is needed — XLA emits the collectives.

Multi-host: `initialize_distributed` wraps jax.distributed.initialize
so the same mesh spans DCN when launched on a multi-host slice.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


def make_mesh(
    n_devices: Optional[int] = None,
    sample_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data',) or ('data','sample') mesh over local devices.

    Args:
      n_devices: total devices to use (default: all available).
      sample_parallel: size of the sample (sequence) axis; must divide
        n_devices. 1 -> pure data-parallel 1-D mesh.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    if sample_parallel <= 1:
        return Mesh(np.array(devs), (DATA_AXIS,))
    if n % sample_parallel:
        raise ValueError(f"sample_parallel={sample_parallel} must divide n_devices={n}")
    arr = np.array(devs).reshape(n // sample_parallel, sample_parallel)
    return Mesh(arr, (DATA_AXIS, SAMPLE_AXIS))


def mesh_axes(mesh: Mesh) -> Tuple[int, int]:
    """(n_data, n_sample) sizes of the mesh axes."""
    n_data = mesh.shape[DATA_AXIS]
    n_sample = mesh.shape.get(SAMPLE_AXIS, 1)
    return n_data, n_sample


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Multi-host bootstrap. Returns True iff a multi-process runtime
    was initialized (or already is).

    Resolution order:
    1. already multi-process (initialize was called earlier) -> True;
    2. explicit args given -> jax.distributed.initialize with them —
       errors PROPAGATE (a mistyped coordinator address must fail loud,
       not fall back to single-process silently);
    3. a launcher environment is detectable (JAX_COORDINATOR_ADDRESS /
       Cloud-TPU metadata — jax.distributed's auto-detect inputs) ->
       argless initialize, errors propagate;
    4. otherwise: a plain single-process run -> False, no-op.

    After a True return, jax.devices() spans the full slice and the
    same shard_map programs scale over DCN (`--distributed` in the
    train driver). jax.process_count() > 1 before initialize is
    impossible, so step 1 only short-circuits repeat calls.
    """
    if jax._src.distributed.global_state.client is not None:  # repeat call
        return jax.process_count() > 1
    explicit = coordinator_address is not None or process_id is not None
    auto_env = any(
        os.environ.get(v)
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    if not (explicit or auto_env):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return jax.process_count() > 1
