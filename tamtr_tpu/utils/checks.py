"""Sanity checks (reference `ultralytics/utils/checks.py` — the subset with a
role in a TPU/zero-egress deployment; font/CUDA/pip checks are N/A)."""

from __future__ import annotations

import re
from typing import List, Sequence, Union

from tamtr_tpu.utils.log import LOGGER


def parse_version(v: str) -> tuple:
    """'1.2.3' -> (1, 2, 3) (reference `checks.py:parse_version`)."""
    return tuple(int(x) for x in re.findall(r"\d+", str(v))[:3] or [0])


def check_version(
    current: str, required: str = "", name: str = "version", hard: bool = False
) -> bool:
    """Compare versions against a constraint string like '>=1.2,<2.0'
    (reference `checks.py:check_version`)."""
    if not required:
        return True
    c = parse_version(current)
    ok = True
    for clause in required.split(","):
        m = re.match(r"([<>=!]*)\s*([\d.]+)", clause.strip())
        if not m:
            continue
        op, ver = m.group(1) or ">=", parse_version(m.group(2))
        ok &= {
            "==": c == ver, "!=": c != ver, ">=": c >= ver,
            "<=": c <= ver, ">": c > ver, "<": c < ver,
        }.get(op, c >= ver)
    if not ok:
        msg = f"{name} {required} is required, but {name}=={current} is installed"
        if hard:
            raise ModuleNotFoundError(msg)
        LOGGER.warning(msg)
    return ok


def check_imgsz(
    imgsz: Union[int, Sequence[int]], stride: int = 32, min_dim: int = 1, floor: int = 0
) -> Union[int, List[int]]:
    """Round image size(s) up to a multiple of the model stride
    (reference `checks.py:check_imgsz`)."""
    scalar = isinstance(imgsz, int)
    sizes = [imgsz] if scalar else list(imgsz)
    out = [max(int(-(-s // stride) * stride), floor) for s in sizes]
    if out != sizes:
        LOGGER.warning(f"imgsz {sizes} not multiple of stride {stride}, updated to {out}")
    if min_dim == 2 and len(out) == 1:
        out = out * 2
    return out[0] if scalar and min_dim == 1 else out


def check_suffix(file: str, suffix: Union[str, Sequence[str]], msg: str = "") -> None:
    """Assert a file has one of the accepted suffixes (reference `check_suffix`)."""
    from pathlib import Path

    suffixes = (suffix,) if isinstance(suffix, str) else tuple(suffix)
    s = Path(file).suffix.lower()
    assert s in suffixes, f"{msg}{file} suffix '{s}' not in {suffixes}"
