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
from tamtr_tpu.utils.patches import imread as _imread

VID_EXTS = {".avi", ".mp4", ".mkv", ".mov", ".wmv", ".m4v", ".mpg", ".mpeg", ".webm"}


def load_inference_source(
    source: Any, vid_stride: int = 1, stream_buffer: bool = True
) -> Generator[Tuple[str, np.ndarray], None, None]:
    """Yield (name, frame_bgr) for images, dirs, videos, webcams, arrays.

    stream_buffer (webcam/stream sources only, reference
    `cfg/default.yaml:63` + `LoadStreams.__init__` buffer arg): True keeps
    every frame (offline processing); False serves only the NEWEST frame —
    a reader thread drains the device while inference runs, so a slow model
    stays real-time instead of falling behind the capture rate.
    """
    import cv2

    if isinstance(source, np.ndarray):
        yield "array", source
        return
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from load_inference_source(s, vid_stride, stream_buffer)
        return
    if isinstance(source, int) or (isinstance(source, str) and source.isdigit()):
        # webcam / stream index
        cap = cv2.VideoCapture(int(source))
        if stream_buffer:
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
        yield from _stream_newest(cap, f"stream{source}", vid_stride)
        return

    if isinstance(source, str) and source.split()[0:1] == ["screen"]:
        yield from load_screenshots(source, vid_stride=vid_stride)
        return

    p = Path(source)
    if p.is_dir():
        for f in sorted(p.rglob("*")):
            if f.suffix.lower() in IMG_EXTS:
                img = _imread(str(f))
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
    img = _imread(str(p))
    if img is None:
        raise FileNotFoundError(f"cannot read source {source}")
    yield str(p), img


def _stream_newest(
    cap, name: str, vid_stride: int = 1
) -> Generator[Tuple[str, np.ndarray], None, None]:
    """Newest-frame-only stream drain (reference `LoadStreams` buffer=False):
    a daemon thread reads the device continuously into a one-slot mailbox;
    the consumer gets the most recent frame and stale frames are dropped."""
    import threading
    import time

    box: dict = {}
    done = threading.Event()

    def reader() -> None:
        i = 0
        try:
            while not done.is_set() and cap.isOpened():
                ok, frame = cap.read()
                if not ok:
                    break
                if i % vid_stride == 0:
                    box["frame"] = (i, frame)  # one-slot: overwrites stale
                i += 1
        finally:
            done.set()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        while True:
            item = box.pop("frame", None)
            if item is None:
                if done.is_set():
                    break
                time.sleep(0.002)
                continue
            i, frame = item
            yield f"{name}_{i}", frame
    finally:
        done.set()
        t.join(timeout=1.0)
        cap.release()


def load_screenshots(
    source: str = "screen",
    vid_stride: int = 1,
    max_frames: int | None = None,
    grab: Any = None,
) -> Generator[Tuple[str, np.ndarray], None, None]:
    """Screen-capture source (reference `LoadScreenshots`, `data/loaders.py:179-243`).

    `source` = "screen [n] [left top width height]" — screen number and/or an
    explicit capture box in pixels. Requires the `mss` package (gated like
    the reference's check_requirements path); `grab` injects a capture
    callable `(monitor_dict) -> HxWx4 BGRA array` for testing.
    """
    parts = str(source).split()
    assert parts and parts[0] == "screen", f"not a screen source: {source!r}"
    params = [int(x) for x in parts[1:]]
    screen, box = 0, None
    if len(params) == 1:
        screen = params[0]
    elif len(params) == 4:
        box = params
    elif len(params) == 5:
        screen, box = params[0], params[1:]

    if grab is None:
        try:
            import mss  # type: ignore
        except ImportError as e:  # pragma: no cover - mss absent in CI image
            raise ImportError(
                "screenshot source needs the `mss` package (pip install mss)"
            ) from e
        sct = mss.mss()
        mon = sct.monitors[screen]
        grab = lambda m: np.asarray(sct.grab(m))
    else:
        mon = {"left": 0, "top": 0, "width": 640, "height": 640}
    if box is not None:
        left, top, width, height = box
        monitor = {
            "left": mon["left"] + left,
            "top": mon["top"] + top,
            "width": width,
            "height": height,
        }
    else:
        monitor = {k: mon[k] for k in ("left", "top", "width", "height")}

    frame = 0
    while max_frames is None or frame < max_frames:
        if frame % vid_stride == 0:
            im = np.asarray(grab(monitor))[..., :3]  # BGRA -> BGR
            yield f"screen{screen}_{frame}", np.ascontiguousarray(im)
        frame += 1
