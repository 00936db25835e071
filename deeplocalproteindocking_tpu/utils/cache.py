"""Persistent XLA compilation cache.

Compiles on the tunneled TPU AOT service cost ~15 s of round-trip floor
and multi-minute worst cases for 128^3 conv graphs (measured); the
persistent cache turns repeat invocations (bench runs, CLI calls,
driver checks) into ~2 s hits.  Safe to call multiple times.
"""
from __future__ import annotations

import os


def cache_dir() -> str:
    """Base persistent-cache directory (backend subdirs live under it).

    Importable without initializing any JAX backend — diagnostics
    (``cli doctor``) must be able to report the cache while the TPU
    tunnel is down.
    """
    return os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax
    try:
        # TPU only: CPU AOT artifacts are machine-feature specific and a
        # cache shared across hosts can SIGILL on load.
        if jax.default_backend() != "tpu":
            return
        # Namespaced per backend so stale CPU-keyed AOT artifacts from
        # another host can never be loaded here (they carry host CPU
        # feature flags and risk SIGILL; observed round 1).
        base = path or cache_dir()
        path = os.path.join(base, jax.default_backend())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimization only
