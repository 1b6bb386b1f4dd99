"""Persistent XLA compilation cache.

The full-size train step takes 2-4 minutes to compile; enabling JAX's
persistent cache makes every process after the first start in seconds.
Keyed by HLO hash + platform, so code changes invalidate cleanly.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Make an explicit ``JAX_PLATFORMS`` env var actually stick.

    The ambient accelerator plugin overrides ``jax_platforms`` at import
    time, SILENTLY ignoring the env var — ``JAX_PLATFORMS=cpu python
    train.py`` would otherwise run on the TPU. jax.config.update after
    import wins (tests/conftest.py uses the same mechanism)."""
    v = os.environ.get("JAX_PLATFORMS")
    if not v:
        return
    try:
        import jax
        jax.config.update("jax_platforms", v)
    except Exception:
        pass


def _host_fingerprint() -> str:
    """Short hash of the host CPU's ISA feature set.

    XLA:CPU AOT executables embed the compile machine's vector features;
    loading one on a host with a different feature set is at best a
    different float-reassociation order and at worst a SIGILL (the loader
    warns "Machine type used for XLA:CPU compilation doesn't match").
    The tunneled environment migrates between hosts, so CPU cache entries
    must be partitioned per feature set. TPU entries are host-agnostic.
    """
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine() or "unknown"


def enable(path: str | None = None) -> None:
    """Best-effort: old jax versions or read-only filesystems just no-op."""
    honor_jax_platforms_env()
    path = path or os.environ.get("DEPTHTPU_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/depthtpu_xla"))
    if os.environ.get("JAX_PLATFORMS", "").strip().lower().startswith("cpu"):
        path = os.path.join(path, "cpu-" + _host_fingerprint())
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
