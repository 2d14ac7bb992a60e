"""Persistent XLA compilation cache setup.

Compilation in this deployment can go through a remote-compile service
(seconds to minutes per program), so every entry point that jits model
code should call :func:`enable_compile_cache` once at startup.  Cached
executables make repeat CLI invocations start in seconds instead of
minutes.

Safe to call multiple times; a no-op if the config knobs are missing or
the cache directory cannot be created.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.jax_cache")


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at *cache_dir*.

    Returns the directory actually used, or None if setup failed.
    Respects ``JAX_COMPILATION_CACHE_DIR``; set
    ``QWEN3_TPU_NO_COMPILE_CACHE=1`` to disable entirely.
    """
    if os.environ.get("QWEN3_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE_DIR
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Remote compiles are never cheap here — persist everything that
        # took more than half a second to build.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return cache_dir
    except Exception:
        return None
