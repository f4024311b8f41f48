"""Runtime configuration helpers shared by the CLI entry points."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache so repeated CLI/bench runs
    skip the 20-40s first-compile of each pipeline shape.  Location:
    explicit arg > $RS2K_JAX_CACHE > ~/.cache/rs2k_jax."""
    import jax

    path = path or os.environ.get(
        "RS2K_JAX_CACHE", os.path.expanduser("~/.cache/rs2k_jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
