"""Inference source loaders: images, directories, videos, webcam streams.

Capability-parity with the reference source routing
(`data/build.py:118-177`, `data/loaders.py`): one generator yielding
(path_or_name, frame_bgr) pairs for the predictor, with video stride
support. Tensors/arrays pass straight through.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Generator, Iterable, List, Tuple, Union

import numpy as np

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}
VID_EXTS = {".avi", ".mp4", ".mkv", ".mov", ".wmv", ".m4v", ".mpg", ".mpeg", ".webm"}


def load_inference_source(
    source: Any, vid_stride: int = 1
) -> Generator[Tuple[str, np.ndarray], None, None]:
    """Yield (name, frame_bgr) for images, dirs, videos, webcams, arrays."""
    import cv2

    if isinstance(source, np.ndarray):
        yield "array", source
        return
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from load_inference_source(s, vid_stride)
        return
    if isinstance(source, int) or (isinstance(source, str) and source.isdigit()):
        # webcam / stream index
        cap = cv2.VideoCapture(int(source))
        i = 0
        try:
            while cap.isOpened():
                ok, frame = cap.read()
                if not ok:
                    break
                if i % vid_stride == 0:
                    yield f"stream{source}_{i}", frame
                i += 1
        finally:
            cap.release()
        return

    p = Path(source)
    if p.is_dir():
        for f in sorted(p.rglob("*")):
            if f.suffix.lower() in IMG_EXTS:
                img = cv2.imread(str(f))
                if img is not None:
                    yield str(f), img
            elif f.suffix.lower() in VID_EXTS:
                yield from load_inference_source(str(f), vid_stride)
        return
    if p.suffix.lower() in VID_EXTS:
        cap = cv2.VideoCapture(str(p))
        i = 0
        try:
            while cap.isOpened():
                ok, frame = cap.read()
                if not ok:
                    break
                if i % vid_stride == 0:
                    yield f"{p}#{i}", frame
                i += 1
        finally:
            cap.release()
        return
    img = cv2.imread(str(p))
    if img is None:
        raise FileNotFoundError(f"cannot read source {source}")
    yield str(p), img
