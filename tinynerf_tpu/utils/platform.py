"""Make JAX_PLATFORMS effective despite the sandbox's jax pre-import.

This environment pre-imports jax at interpreter start (sitecustomize)
with the axon TPU plugin registered, so the JAX_PLATFORMS environment
variable is read before a driver's own env can matter — `JAX_PLATFORMS=
cpu python -m tinynerf_tpu.train` would still try to initialize the
remote TPU backend (and HANG, not error, when the tunnel is down —
measured r4). Calling honor_platform_env() at driver start re-asserts
the env var through jax.config, which IS still effective because no
backend has been initialized yet at that point.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        jax.config.update("jax_platforms", env)
