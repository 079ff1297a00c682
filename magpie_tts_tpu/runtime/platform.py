"""Platform selection + observability.

Analog of the reference's backend selector with fallback
(src/magpie.cpp:14-67: AUTO -> CUDA -> Metal -> CPU): here AUTO -> TPU -> CPU,
expressed through JAX platform config. Also hosts the stage-timing and
profiler-trace helpers (the reference's equivalent is stderr prints + chrono
timers, magpie.cpp:4079-4429).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional


def select_platform(backend: str = "auto") -> str:
    """Pin the JAX platform. Call before any device use.

    backend: "auto" (prefer TPU, fall back to CPU), "tpu", or "cpu".
    Returns the platform actually selected.
    """
    import jax

    backend = backend.lower()
    if backend not in ("auto", "tpu", "cpu"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    try:
        devices = jax.devices()
        platform = devices[0].platform
        if backend == "tpu" and platform not in ("tpu", "axon"):
            raise RuntimeError(f"TPU requested but platform is {platform}")
        return platform
    except RuntimeError:
        if backend == "tpu":
            raise
        jax.config.update("jax_platforms", "cpu")
        return "cpu"


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Cold compiles dominate process start on TPU (~50s for the full synthesis
    program); with the on-disk cache a second process deserializes the
    executables instead of recompiling. The CLI and serving entry points call
    this at startup; MAGPIE_COMPILATION_CACHE overrides the location, and
    MAGPIE_COMPILATION_CACHE=0 disables it.
    """
    import jax

    env = os.environ.get("MAGPIE_COMPILATION_CACHE")
    if env == "0":
        return ""
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "magpie_tts_tpu", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def device_summary() -> str:
    import jax

    devices = jax.devices()
    kinds = {}
    for d in devices:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    return ", ".join(f"{n}x {k}" for k, n in kinds.items())


class StageTimer:
    """Wall-clock stage timing with an accumulated report."""

    def __init__(self):
        self.stages: List[tuple] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.append((name, time.perf_counter() - t0))

    def report(self) -> str:
        total = sum(dt for _, dt in self.stages)
        lines = [f"  {name:32s} {dt * 1e3:9.2f} ms ({dt / total * 100:5.1f}%)"
                 for name, dt in self.stages]
        lines.append(f"  {'total':32s} {total * 1e3:9.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str] = None):
    """jax.profiler trace (view with TensorBoard / xprof). No-op if dir unset."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
