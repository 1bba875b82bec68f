"""Process-wide JAX configuration: persistent compilation cache.

The Mosaic/XLA compiles of the full model (and each distinct Pallas kernel
shape) take minutes; the persistent cache makes every subsequent process
start in seconds. Called by the engine, bench, and the driver entrypoints.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    if os.environ.get("TAMTR_JAX_CACHE", "1") == "0":
        # Escape hatch for the multichip dryrun: a cold compile is more
        # deterministic than deserializing an AOT artifact that may have been
        # produced by a host with a different XLA target config (observed as
        # "could lead to execution errors such as SIGILL" warnings and, worst
        # case, one device thread stalling long enough to starve a CPU
        # collective rendezvous).
        _DONE = True
        return
    import jax

    base = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", str(Path.home() / ".cache" / "tamtr_jax")
    )
    try:
        # per-backend subdirectory: a cache shared between the TPU and CPU
        # runtimes aborts on executable deserialization
        backend = jax.default_backend()
        sub = backend
        if backend == "cpu":
            # XLA:CPU AOT results embed the COMPILING host's CPU features;
            # loading them on a host with different features warns "could
            # lead to execution errors such as SIGILL" (observed as a
            # crashed test-suite process). Key the cpu cache by a hash of
            # this host's feature flags so artifacts never cross hosts.
            import hashlib

            try:
                flags = next(
                    l for l in open("/proc/cpuinfo") if l.startswith("flags")
                )
            except Exception:
                import platform

                flags = platform.processor() or "unknown"
            sub = f"cpu-{hashlib.sha1(flags.encode()).hexdigest()[:8]}"
        cache = str(Path(base) / sub)
        Path(cache).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _DONE = True
