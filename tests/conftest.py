"""Test configuration: run the whole suite on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).

This machine's sitecustomize force-registers the axon TPU backend via
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so env
vars alone don't steer tests to CPU — undo it with config updates before any
backend initializes (conftest import runs before test modules import jax
arrays into devices).
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_line3d_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
