"""Persistent XLA compilation cache.

Cold serving starts are compile-dominated: the full pipeline traces
stage-1 + gossip forwards at several bucket shapes, and each fresh
compile costs seconds-to-minutes through a remote-compiler tunnel
(RESULTS.md). The reference has no answer to this (every Lightning run
recompiles nothing because eager torch never compiles — and pays for it
per batch instead). TPU-natively the fix is the XLA persistent cache:
compiled executables are keyed by (HLO, compile options, platform) and
written to disk, so a serving process restart — or a second run of the
same training config — reloads binaries instead of recompiling.

Safe to call more than once; later calls with a different directory
re-point the cache.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str,
                             min_compile_secs: float = 0.5) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Executables that took longer than ``min_compile_secs`` to compile
    are persisted (tiny kernels are cheaper to recompile than to load).
    Returns the absolute cache path. Call BEFORE the first ``jit``
    dispatch for full effect; compiles that already happened are simply
    not cached.
    """
    path = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # cache regardless of executable size; the tunnel round-trip always
    # dwarfs the disk read
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
