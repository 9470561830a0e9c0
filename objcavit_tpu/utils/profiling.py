"""Tracing / profiling utilities (SURVEY.md §5 aux subsystems).

The reference installs torch-tb-profiler but never invokes it; observability
is TensorBoard scalars only. Here profiling is first-class:

  * ``trace(logdir)`` — context manager around jax.profiler.trace; view with
    TensorBoard's profile plugin (works against the real TPU).
  * ``annotate(name)`` — jax.profiler.TraceAnnotation + named_scope so model
    stages show up in traces and HLO.
  * ``enable_nan_debugging()`` — jax_debug_nans, the jit-native replacement
    for the reference's patch-over of NaNs at metrics time
    (MetricsPreprocess.py:20-24 — which we still replicate for parity).
  * ``device_memory_stats()`` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> dict:
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats
