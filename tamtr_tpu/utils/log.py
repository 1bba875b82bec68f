"""Process-aware logger (reference LOGGER, `utils/__init__.py:227-248`)."""

from __future__ import annotations

import logging
import os
import sys

_rank0 = True
try:
    import jax

    # defer: jax.process_index() initializes the backend; use env hints first
    _rank0 = int(os.environ.get("JAX_PROCESS_INDEX", "0")) == 0
except Exception:
    pass

LOGGER = logging.getLogger("tamtr_tpu")
if not LOGGER.handlers:
    h = logging.StreamHandler(sys.stdout)
    h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(h)
    LOGGER.setLevel(logging.INFO if _rank0 else logging.ERROR)
    LOGGER.propagate = False  # avoid double prints through the root logger
