"""Test env: run JAX on CPU with 8 virtual devices so sharding tests work
without TPU hardware (the standard JAX answer to multi-chip testing).

Note: the image's sitecustomize pre-imports jax (axon TPU plugin) before this
conftest runs, so setting env vars here is too late for the platform choice —
we must go through jax.config, which works as long as no backend has been
initialised yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-bound on this 1-core
# host; cached executables cut repeat runs from ~45 min toward interactive
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual-CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() == 8, f"expected 8 virtual devices, got {jax.device_count()}"
