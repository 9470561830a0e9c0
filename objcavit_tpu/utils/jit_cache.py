"""Persistent XLA compilation cache (host-local).

OPT-IN (OBJCAVIT_JIT_CACHE=1): measured on the axon TPU tunnel, executable
deserialisation HANGS the backend (a 900s timeout with zero output vs ~540s
uncached), so the cache must not be on by default there. The CPU test suite
enables its own cache in tests/conftest.py, where it verifiably works
(kill-and-resume test: >595s cold -> 242s warm).
"""

from __future__ import annotations

import os


def enable(path: str | None = None) -> None:
    if not os.environ.get("OBJCAVIT_JIT_CACHE"):
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("JAX_CACHE_DIR", "/tmp/jax_objcavit_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
