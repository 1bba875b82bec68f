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
    import jax

    base = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", str(Path.home() / ".cache" / "tamtr_jax")
    )
    try:
        # per-backend subdirectory: a cache shared between the TPU and CPU
        # runtimes aborts on executable deserialization
        cache = str(Path(base) / jax.default_backend())
        Path(cache).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _DONE = True
