"""Persistent XLA compilation cache shared by every chip entry point.

The tunneled-chip runtime makes first compiles expensive (minutes per
program); with the cache each previously-seen program is a disk read.
Used by the server (``--compile_cache``), ``bench.py``, and the
measurement tools — one helper so the directory and thresholds cannot
drift between them.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "~/.cache/zonos_tpu/xla"


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` (defaults
    to ``~/.cache/zonos_tpu/xla``).  Returns the directory, or None if the
    cache could not be enabled (never raises — a missing cache only costs
    compile time)."""
    import jax

    path = os.path.expanduser(cache_dir or DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:
        return None
