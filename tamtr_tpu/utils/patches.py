"""Robust cv2 IO wrappers (reference `utils/patches.py`).

cv2.imread/imwrite cannot handle non-ASCII (multilanguage) paths on every
platform; routing through np.fromfile + imdecode / imencode + tofile makes
image IO path-encoding-safe. Used by the dataset reader and Results.save.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def imread(filename: str, flags: Optional[int] = None) -> Optional[np.ndarray]:
    """Unicode-safe cv2.imread (reference `patches.py:imread`)."""
    import cv2

    if flags is None:
        flags = cv2.IMREAD_COLOR
    try:
        data = np.fromfile(str(filename), np.uint8)
    except OSError:
        return None
    if data.size == 0:
        return None
    return cv2.imdecode(data, flags)


def imwrite(filename: str, img: np.ndarray, params=None) -> bool:
    """Unicode-safe cv2.imwrite (reference `patches.py:imwrite`)."""
    import cv2

    try:
        ok, buf = cv2.imencode(Path(str(filename)).suffix, img, params or [])
        if not ok:
            return False
        buf.tofile(str(filename))
        return True
    except Exception:
        return False
