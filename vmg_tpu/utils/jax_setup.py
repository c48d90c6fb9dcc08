"""Process-level JAX runtime setup."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: first compile of the big model is
    minutes; cached reloads are seconds.

    ``VMG_NO_COMPILE_CACHE=1`` disables it -- used by the bench variance
    protocol (compile outcomes near a memory cliff are a distribution,
    docs/PERF.md rule 7; median-of-3 fresh compiles is the headline
    protocol since round 5)."""
    import jax

    if os.environ.get("VMG_NO_COMPILE_CACHE") == "1":
        return
    path = path or os.path.join(os.path.dirname(__file__), os.pardir,
                                os.pardir, ".cache", "jax")
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
