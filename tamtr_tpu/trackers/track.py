"""Tracker integration with the predictor (reference `trackers/track.py:56-65`).

The reference registers an `on_predict_postprocess_end` callback that feeds
each frame's detections into a persistent tracker and rewrites the Results
boxes with track ids. Here `Engine.track` drives the same loop explicitly:
stream frames -> predict -> tracker.update -> Results with `track_ids`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from tamtr_tpu.trackers.bot_sort import BOTSORT
from tamtr_tpu.trackers.byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def make_tracker(name: str = "bytetrack", **kwargs: Any):
    """Build a tracker by name; accepts reference-style 'bytetrack.yaml'."""
    stem = str(name).replace(".yaml", "").replace(".yml", "").lower()
    if stem not in TRACKER_MAP:
        raise ValueError(f"unknown tracker {name}; available: {list(TRACKER_MAP)}")
    return TRACKER_MAP[stem](**kwargs)


def update_result_with_tracks(result, tracker, frame: Optional[np.ndarray] = None) -> None:
    """Feed one frame's detections to the tracker; attach track ids in place.

    After the call `result.track_ids` holds one id per kept box (tracker
    output order), and result.boxes holds the tracked boxes. `frame` (BGR)
    enables BOTSORT's camera-motion compensation and ReID appearance branch;
    plain BYTETracker ignores it.
    """
    b = result.boxes
    kwargs = {}
    if frame is not None and isinstance(tracker, BOTSORT):
        kwargs["frame_bgr"] = frame
    out = tracker.update(
        np.asarray(b.xyxy, np.float32),
        np.asarray(b.conf, np.float32),
        np.asarray(b.cls, np.float32),
        **kwargs,
    )
    if len(out) == 0:
        result.track_ids = np.zeros((0,), np.int64)
        return
    from tamtr_tpu.engine.results import Boxes

    result.boxes = Boxes(out[:, :4], out[:, 5], out[:, 6])
    result.track_ids = out[:, 4].astype(np.int64)
