"""Persistent XLA compilation cache.

First compiles of the full-size models take minutes (20-40s per program on
a directly-attached chip; worse through remote-compile relays). Enabling
the on-disk cache makes every later process start — reruns, preemption
restarts (Trainer --resume), serving replicas — reuse the compiled
executables instead of recompiling.

Enable with ``enable_compilation_cache(dir)`` or the
``ENHANCING_TPU_COMPILE_CACHE`` env var (main.py/bench.py call
:func:`maybe_enable_from_env` at startup).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

ENV_VAR = "ENHANCING_TPU_COMPILE_CACHE"


def enable_compilation_cache(cache_dir: str | Path) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``."""
    import jax

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    # cache every program regardless of its compile time (the default
    # min-duration heuristic skips small programs; cold-start latency on
    # relay backends is dominated by exactly those)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def maybe_enable_from_env(default: str | Path | None = None) -> Optional[str]:
    """Enable the cache if ENHANCING_TPU_COMPILE_CACHE is set (or ``default``
    is given); returns the directory used (or None).

    ``default`` lets entrypoints with no user-facing flag (bench.py,
    __graft_entry__) opt into a repo-local cache: through the axon relay a
    cold compile of the full bench program has been observed to take >15
    minutes, so warming the cache once makes every later driver run cheap.

    When the env var is SET it is honored verbatim — an explicitly empty
    value disables the cache even when a ``default`` is supplied (the
    natural off switch); ``default`` applies only when the var is absent.
    """
    env_val = os.environ.get(ENV_VAR)
    if env_val is not None:
        cache_dir = env_val or None
    else:
        cache_dir = str(default) if default else None
    if cache_dir:
        enable_compilation_cache(cache_dir)
    return cache_dir
