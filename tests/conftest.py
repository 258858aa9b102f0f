"""Test configuration: run the whole suite on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).

This machine's sitecustomize force-registers the axon TPU backend via
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so env
vars alone don't steer tests to CPU — undo it with config updates before any
backend initializes (conftest import runs before test modules import jax
arrays into devices).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# env vars don't reach jax's config (sitecustomize imported jax already) —
# use config updates, like the CLI/bench (utils/xla_cache.py)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_line3d_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
