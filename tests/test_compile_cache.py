"""Persistent XLA compilation cache (utils/compile_cache.py).

Serving cold starts are compile-dominated (RESULTS.md); the cache lets a
restart reload compiled executables. These tests pin the config wiring
and that entries actually land on disk (threshold 0 — the test kernel
compiles in ms).
"""

import glob
import os

import jax
import jax.numpy as jnp

from desco_tpu.utils.compile_cache import enable_compilation_cache


def test_enable_sets_config_and_persists(tmp_path):
    d = str(tmp_path / "cache")
    out = enable_compilation_cache(d, min_compile_secs=0.0)
    assert out == os.path.abspath(d)
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == out

    # a fresh (per-tmp_path-unique shape) jit must write an entry
    n = 37  # unlikely to collide with other tests' cached shapes
    jax.jit(lambda x: jnp.tanh(x @ x))(jnp.ones((n, n))).block_until_ready()
    assert len(glob.glob(os.path.join(d, "*"))) >= 1


def test_repoint_is_safe(tmp_path):
    a = enable_compilation_cache(str(tmp_path / "a"))
    b = enable_compilation_cache(str(tmp_path / "b"))
    assert a != b
    assert jax.config.jax_compilation_cache_dir == b
