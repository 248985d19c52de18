"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize imports jax at interpreter start (axon TPU
plugin), so plain env vars are too late; override the platform through
jax.config before any backend is created.  Multi-chip sharding tests then
run on 8 virtual CPU devices without TPU hardware (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by CPU jit compiles
# (~20 min cold).  Cache compiled executables across runs; correctness runs
# are unaffected (keys cover HLO + flags + platform).
_cache_dir = os.environ.get(
    "GEOGRAYPHER_TEST_CACHE", "/tmp/geograypher_jax_cache"
)
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
