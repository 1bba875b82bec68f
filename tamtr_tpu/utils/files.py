"""Path utilities (reference `ultralytics/utils/files.py`)."""

from __future__ import annotations

from pathlib import Path


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/train -> runs/train2, train3, ... (reference `files.py:increment_path`)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        base, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = Path(f"{base}{sep}{n}{suffix}")
            if not p.exists():
                path = p
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def file_size(path: str | Path) -> float:
    """Size in MB of a file or directory tree (reference `files.py:file_size`)."""
    mb = 1 << 20
    p = Path(path)
    if p.is_file():
        return p.stat().st_size / mb
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file()) / mb
    return 0.0
