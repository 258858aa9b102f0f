"""Persistent XLA compilation-cache setup.

Setting JAX_COMPILATION_CACHE_DIR via os.environ in an entry point does NOT
work on this machine: the TPU plugin's sitecustomize imports jax at
interpreter startup, so jax's config has already read the (unset) env vars
by the time any script body runs.  jax.config.update works at any point
before the first compilation, so entry points call this instead.
"""
from __future__ import annotations

import os

DEFAULT_DIR = "~/.cache/line3d_tpu_xla"


def enable_persistent_cache(path: str = DEFAULT_DIR,
                            min_compile_secs: float = 0.5) -> None:
    """Enable jax's on-disk compilation cache (idempotent, safe pre/post
    jax import; must run before the first jit compilation to matter)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
