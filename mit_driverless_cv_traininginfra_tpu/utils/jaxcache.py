"""Persistent XLA compilation cache — the one-liner every entry script needs.

A cold compile of any nontrivial program through the axon TPU tunnel takes
minutes (CLAUDE.md "Compile latency"), so every benchmark/probe/driver
entry point enables the on-disk cache before first jax use. Cache keys
include the compiler version, so a toolchain update recompiles naturally.

Call :func:`enable_compile_cache` BEFORE the first jit/compile (importing
jax first is fine).
"""

from __future__ import annotations

import os

CACHE_DIR = "~/.cache/jax_comp_cache"


def enable_compile_cache(cache_dir: str = CACHE_DIR) -> bool:
    """Point jax at a persistent on-disk compilation cache.

    Caches every entry regardless of size/compile time (through the
    tunnel even tiny programs are worth caching). Returns True if the
    config took, False on any failure (old jax, read-only fs) — callers
    proceed either way; the cache is an optimization, never a
    requirement."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception:
        return False
