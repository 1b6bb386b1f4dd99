"""Persistent XLA compilation cache.

The full-size train step takes 2-4 minutes to compile; enabling JAX's
persistent cache makes every process after the first start in seconds.
Keyed by HLO hash + platform, so code changes invalidate cleanly.
"""

from __future__ import annotations

import os


def enable(path: str | None = None) -> None:
    """Best-effort: old jax versions or read-only filesystems just no-op."""
    path = path or os.environ.get("DEPTHTPU_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/depthtpu_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
    except Exception:
        pass
