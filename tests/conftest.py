"""Test configuration: run the whole suite on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).
Must run before the first `import jax` anywhere in the test process.
"""
import os

# FORCE cpu: the machine environment presets JAX_PLATFORMS=axon (the TPU
# tunnel); tests must not ride it (single-client tunnel, serialized and slow).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: XLA-CPU compiles of the match kernels take
# O(minutes); cache them across pytest processes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_line3d_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
