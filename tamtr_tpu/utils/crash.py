"""Local crash reporting (the zero-egress counterpart of the reference's
Sentry telemetry, `utils/__init__.py:753-826` `set_sentry`).

`set_crash_reporting()` installs a sys.excepthook that, when an unhandled
exception escapes the engine/CLI, writes a crash report file
(`crash_<timestamp>.txt`: traceback + environment summary) under the
settings config dir. Mirrors the reference's gating semantics where they
make sense offline:

  - only active when `SETTINGS["sync"]` is True (same master switch),
  - KeyboardInterrupt / FileNotFoundError are ignored (reference
    `before_send`), as are out-of-memory messages,
  - not installed under pytest.

Nothing ever leaves the machine — the "report" is a local file the user can
attach to a bug report themselves.
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from pathlib import Path
from typing import Optional

_INSTALLED = False
_PREV_HOOK = None


def _crash_dir() -> Path:
    from tamtr_tpu.utils.settings import _config_dir

    return _config_dir() / "crash_reports"


def write_crash_report(exc_type, exc_value, tb, extra: str = "") -> Optional[Path]:
    """Write one crash report; returns the path (None on any failure)."""
    try:
        d = _crash_dir()
        d.mkdir(parents=True, exist_ok=True)
        stamp = f"{time.strftime('%Y%m%d_%H%M%S')}_{int(time.time() * 1e6) % 1000000:06d}"
        path = d / f"crash_{stamp}_{os.getpid()}.txt"
        import platform

        lines = [
            f"tamtr_tpu crash report  {time.strftime('%Y-%m-%d %H:%M:%S')}",
            f"python: {sys.version.split()[0]}  platform: {platform.platform()}",
            f"argv: {sys.argv}",
            f"cwd: {os.getcwd()}",
        ]
        try:
            import jax

            lines.append(f"jax: {jax.__version__}  backend: {jax.default_backend()}")
        except Exception:
            pass
        if extra:
            lines.append(extra)
        lines.append("")
        lines.extend(traceback.format_exception(exc_type, exc_value, tb))
        path.write_text("\n".join(lines))
        return path
    except Exception:
        return None


def _hook(exc_type, exc_value, tb):
    if not (
        exc_type in (KeyboardInterrupt, FileNotFoundError)
        or "out of memory" in str(exc_value).lower()
        or "resource_exhausted" in str(exc_value).lower()
    ):
        p = write_crash_report(exc_type, exc_value, tb)
        if p is not None:
            print(f"crash report written to {p}", file=sys.stderr)
    if _PREV_HOOK is not None:
        _PREV_HOOK(exc_type, exc_value, tb)


def set_crash_reporting() -> bool:
    """Install the crash-report excepthook if settings allow. Idempotent."""
    global _INSTALLED, _PREV_HOOK
    if _INSTALLED:
        return True
    if "PYTEST_CURRENT_TEST" in os.environ or "pytest" in sys.modules:
        return False
    try:
        from tamtr_tpu.utils.settings import SETTINGS

        if not SETTINGS.get("sync", False):
            return False
    except Exception:
        return False
    _PREV_HOOK = sys.excepthook
    sys.excepthook = _hook
    _INSTALLED = True
    return True
