"""Process-level JAX setup for the CLIs/services.

Enables the persistent compilation cache: the fused extraction program and
the TV-L1 Pallas kernels cost 25-60 s to compile per geometry, which
dominates short CLI runs; with the cache, repeat invocations (the common
production pattern: same clip geometry every video) start hot.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.environ.get(
    "VIDEOQUERY_JAX_CACHE", os.path.expanduser("~/.cache/videoquery/jax")
)


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent, best-effort)."""
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # never fail a service for cache trouble
        log.warning("could not enable jax compilation cache: %s", exc)
