"""Persistent XLA compilation cache.

The fused search kernels are large programs (order-4 jet algebra unrolled
through a 128-node scan); CPU compiles take minutes.  JAX's persistent
compilation cache makes them a one-time cost per (kernel, backend) across
processes — essential for fast test runs and resumed discoveries.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax
    cache_dir = path or os.environ.get(
        "PDE_ENGINE_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pde_engine_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    _DONE = True
