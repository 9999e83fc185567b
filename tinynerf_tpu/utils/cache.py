"""Persistent XLA compilation cache.

On this class of TPU deployment, compiling a 1000-step scan block takes
one to two minutes (AOT compile through the runtime service) while
executing it takes under a second — wall-clock is compile-dominated for
short jobs. The persistent cache makes every repeat invocation hit disk
instead: measured 70.6s -> 1.6s for the fused train block.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = ".jax_cache"


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    """Idempotently enable the on-disk compilation cache.

    Every CLI driver calls this first, so it doubles as the driver-init
    hook that re-asserts JAX_PLATFORMS (see utils/platform.py — the
    sandbox pre-imports jax, making the env var silently ineffective
    otherwise)."""
    import jax

    from tinynerf_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these knobs: compile costs stay as-is
