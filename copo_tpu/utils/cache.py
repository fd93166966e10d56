"""Persistent XLA compilation cache setup.

On the remote-attached TPU backend a full train-iteration program takes
minutes to compile (the run itself is ~80 ms/iter at the reference batch
size), and the benchmark grid compiles ~24 distinct (algo, scene) programs.
The persistent cache makes every recompile of an unchanged program a disk
hit. Scripts call `enable_compile_cache()` once, before building trainers.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/copo_tpu_xla")


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent)."""
    cache_dir = cache_dir or os.environ.get(
        "COPO_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
