"""Process-level JAX runtime setup."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: first compile of the big model is
    minutes; cached reloads are seconds."""
    import jax

    path = path or os.path.join(os.path.dirname(__file__), os.pardir,
                                os.pardir, ".cache", "jax")
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
