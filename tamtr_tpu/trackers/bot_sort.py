"""BoT-SORT: BYTETracker + camera-motion compensation (GMC).

Capability-parity rebuild of the reference BOTSORT
(`trackers/bot_sort.py` + `trackers/utils/gmc.py`): before association,
a global affine transform estimated between consecutive frames (sparse
optical flow) is applied to the Kalman-predicted track boxes. The optional
ReID appearance branch is stubbed behind `with_reid` (off by default, as in
the reference config).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from tamtr_tpu.trackers.byte_tracker import BYTETracker, Track, xyah2xyxy, xyxy2xyah


class GMC:
    """Sparse-optical-flow global motion compensation (`gmc.py` method='sparseOptFlow')."""

    def __init__(self, downscale: int = 2):
        self.downscale = max(1, downscale)
        self.prev_gray: Optional[np.ndarray] = None
        self.prev_pts = None

    def apply(self, frame_bgr: np.ndarray) -> np.ndarray:
        import cv2

        H = np.eye(2, 3, dtype=np.float32)
        gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
        pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3
        )
        if self.prev_gray is not None and self.prev_pts is not None and pts is not None:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, self.prev_pts, None)
            if nxt is not None:
                good_prev = self.prev_pts[status.ravel() == 1]
                good_next = nxt[status.ravel() == 1]
                if len(good_prev) >= 4:
                    M, _ = cv2.estimateAffinePartial2D(good_prev, good_next, method=cv2.RANSAC)
                    if M is not None:
                        H = M.astype(np.float32)
                        H[:, 2] *= self.downscale
        self.prev_gray = gray
        self.prev_pts = pts
        return H


class BOTSORT(BYTETracker):
    def __init__(self, *args, gmc_downscale: int = 2, with_reid: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.gmc = GMC(gmc_downscale)
        self.with_reid = with_reid  # appearance embeddings: not wired (reference default off)

    @staticmethod
    def _apply_affine(track: Track, H: np.ndarray) -> None:
        b = track.xyxy
        pts = np.array([[b[0], b[1]], [b[2], b[3]]], np.float32)
        warped = pts @ H[:, :2].T + H[:, 2]
        xyah = xyxy2xyah(np.array([warped[0, 0], warped[0, 1], warped[1, 0], warped[1, 1]]))
        track.mean[:4] = xyah

    def update(self, boxes, scores, classes, frame_bgr: Optional[np.ndarray] = None):
        if frame_bgr is not None:
            H = self.gmc.apply(frame_bgr)
            for t in self.tracked + self.lost:
                self._apply_affine(t, H)
        return super().update(boxes, scores, classes)
