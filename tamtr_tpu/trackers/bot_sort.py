"""BoT-SORT: BYTETracker + camera-motion compensation (GMC) + ReID.

Capability-parity rebuild of the reference BOTSORT
(`trackers/bot_sort.py` + `trackers/utils/gmc.py:11-302`): before
association, a global affine transform estimated between consecutive frames
is applied to the Kalman-predicted track boxes, and (optionally) appearance
embeddings gate/augment the first association.

GMC methods mirror the reference set — 'sparseOptFlow' (default), 'orb',
'sift', 'ecc', 'none' — selected via ``gmc_method`` (reference
`cfg/trackers/botsort.yaml`).

ReID: the reference declares `with_reid` but ships NO encoder
("Haven't supported BoT-SORT(reid) yet", reference `bot_sort.py:157`).
Here `with_reid=True` is functional: a pluggable ``encoder(frame, boxes) ->
(N, D)`` supplies embeddings (default: a normalized color-layout patch
embedder — no external ReID network exists in this offline image); tracks
smooth them with the reference's 0.9 EMA (`BOTrack.update_features`), and
the stage-1 cost becomes ``min(fused_iou, emb/2)`` with the reference's
proximity/appearance gates (`bot_sort.py:178-192`). Deviation from the
reference (documented): ours actually associates on appearance; the
reference's branch is dead code. Kalman state stays XYAH (shared with
ByteTrack) rather than the reference BOTrack's XYWH.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from tamtr_tpu.trackers.byte_tracker import (
    BYTETracker, Track, iou_distance, xyah2xyxy, xyxy2xyah,
)


class GMC:
    """Global motion compensation between consecutive frames.

    Returns a 2x3 affine H mapping previous-frame coordinates to the
    current frame (identity on the first frame or on failure).
    """

    METHODS = ("sparseOptFlow", "orb", "sift", "ecc", "none")

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        if method in (None, "None"):
            method = "none"
        if method not in self.METHODS:
            raise ValueError(f"unknown GMC method {method!r}; one of {self.METHODS}")
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev_gray: Optional[np.ndarray] = None
        self.prev_pts = None
        self.prev_kp = None
        self.prev_desc = None

    def _prep(self, frame_bgr: np.ndarray) -> np.ndarray:
        import cv2

        gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            if self.method == "ecc":
                gray = cv2.GaussianBlur(gray, (3, 3), 1.5)
            gray = cv2.resize(
                gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale)
            )
        return gray

    def _affine_from_points(self, prev_pts: np.ndarray, cur_pts: np.ndarray):
        import cv2

        if len(prev_pts) < 4:
            return None
        M, _ = cv2.estimateAffinePartial2D(prev_pts, cur_pts, method=cv2.RANSAC)
        return M

    def apply(self, frame_bgr: np.ndarray) -> np.ndarray:
        H = np.eye(2, 3, dtype=np.float32)
        if self.method == "none":
            return H
        gray = self._prep(frame_bgr)
        if self.method == "sparseOptFlow":
            H = self._apply_sparse_flow(gray, H)
        elif self.method == "ecc":
            H = self._apply_ecc(gray, H)
        else:
            H = self._apply_features(gray, H)
        if self.method != "ecc":  # ecc works in downscaled space end-to-end
            H = H.copy()
            H[:, 2] *= self.downscale
        return H

    def _apply_sparse_flow(self, gray, H):
        import cv2

        pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3
        )
        if self.prev_gray is not None and self.prev_pts is not None and pts is not None:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(
                self.prev_gray, gray, self.prev_pts, None
            )
            if nxt is not None:
                good_prev = self.prev_pts[status.ravel() == 1]
                good_next = nxt[status.ravel() == 1]
                M = self._affine_from_points(good_prev, good_next)
                if M is not None:
                    H = M.astype(np.float32)
        self.prev_gray = gray
        self.prev_pts = pts
        return H

    def _apply_ecc(self, gray, H):
        import cv2

        if self.prev_gray is not None:
            try:
                criteria = (
                    cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 5000, 1e-6
                )
                _, M = cv2.findTransformECC(
                    self.prev_gray, gray, H.copy(), cv2.MOTION_EUCLIDEAN,
                    criteria, None, 1,
                )
                # euclidean warp in downscaled space: rescale translation back
                M = M.astype(np.float32)
                M[:, 2] *= self.downscale
                H = M
            except Exception:
                pass  # identity on non-convergence (reference behavior)
        self.prev_gray = gray
        return H

    def _apply_features(self, gray, H):
        """ORB / SIFT keypoint matching with Lowe ratio + spatial-outlier
        rejection (reference `gmc.py:applyFeatures`)."""
        import cv2

        h, w = gray.shape
        mask = np.zeros_like(gray)
        mask[int(0.02 * h):int(0.98 * h), int(0.02 * w):int(0.98 * w)] = 255
        if self.method == "orb":
            det = cv2.FastFeatureDetector_create(20)
            ext = cv2.ORB_create()
            matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
        else:
            det = ext = cv2.SIFT_create(
                nOctaveLayers=3, contrastThreshold=0.02, edgeThreshold=20
            )
            matcher = cv2.BFMatcher(cv2.NORM_L2)
        kp = det.detect(gray, mask)
        kp, desc = ext.compute(gray, kp)
        if (
            self.prev_gray is not None
            and self.prev_desc is not None
            and desc is not None
            and len(desc) > 0
            and len(self.prev_desc) > 1
        ):
            knn = matcher.knnMatch(self.prev_desc, desc, 2)
            max_sd = 0.25 * np.array([w, h])
            cand, sds = [], []
            for pair in knn:
                if len(pair) < 2:
                    continue
                m, n = pair
                if m.distance < 0.9 * n.distance:
                    p = self.prev_kp[m.queryIdx].pt
                    q = kp[m.trainIdx].pt
                    sd = (p[0] - q[0], p[1] - q[1])
                    if abs(sd[0]) < max_sd[0] and abs(sd[1]) < max_sd[1]:
                        cand.append((p, q))
                        sds.append(sd)
            if sds:
                sds = np.asarray(sds)
                inl = np.all(
                    np.abs(sds - sds.mean(0)) < 2.5 * (sds.std(0) + 1e-9), axis=1
                )
                prev_pts = np.asarray([c[0] for c in cand], np.float32)[inl]
                cur_pts = np.asarray([c[1] for c in cand], np.float32)[inl]
                M = self._affine_from_points(prev_pts, cur_pts)
                if M is not None:
                    H = M.astype(np.float32)
        self.prev_gray = gray
        self.prev_kp = kp
        self.prev_desc = desc
        return H


def patch_appearance_encoder(frame_bgr: np.ndarray, boxes: np.ndarray,
                             grid: int = 8) -> np.ndarray:
    """Default ReID embedder: per-box normalized color-layout descriptor.

    Crops each box, resizes to (grid, grid) RGB, subtracts the patch mean
    per channel and L2-normalizes — a deliberately lightweight stand-in for
    an external ReID network (none exists in this offline image). Injection
    point for a real embedder: pass ``encoder=`` to BOTSORT (e.g. detector
    decoder features projected per box).
    """
    import cv2

    Hf, Wf = frame_bgr.shape[:2]
    out = np.zeros((len(boxes), grid * grid * 3), np.float32)
    for i, b in enumerate(np.asarray(boxes)):
        x1, y1, x2, y2 = (int(max(0, b[0])), int(max(0, b[1])),
                          int(min(Wf, b[2])), int(min(Hf, b[3])))
        if x2 <= x1 or y2 <= y1:
            continue
        patch = cv2.resize(frame_bgr[y1:y2, x1:x2], (grid, grid)).astype(np.float32)
        # fixed centering (not per-patch mean: that zeroes solid-color
        # patches, the exact case color identity must survive)
        v = (patch / 255.0 - 0.5).ravel()
        out[i] = v / max(float(np.linalg.norm(v)), 1e-12)
    return out


def embedding_distance(tracks: List[Track], feats: np.ndarray) -> np.ndarray:
    """Cosine distance between track smooth features and detection features
    (reference `matching.py:embedding_distance`)."""
    if not tracks or len(feats) == 0:
        return np.zeros((len(tracks), len(feats)), np.float32)
    tf = np.stack([
        t.smooth_feat if t.smooth_feat is not None else np.zeros(feats.shape[1])
        for t in tracks
    ]).astype(np.float32)
    sim = tf @ feats.T  # rows/cols are L2-normalized
    return np.maximum(0.0, 1.0 - sim)


class BOTSORT(BYTETracker):
    def __init__(self, *args, gmc_method: str = "sparseOptFlow",
                 gmc_downscale: int = 2, with_reid: bool = False,
                 proximity_thresh: float = 0.5, appearance_thresh: float = 0.25,
                 encoder: Optional[Callable] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.gmc = GMC(gmc_method, gmc_downscale)
        self.with_reid = bool(with_reid)
        self.proximity_thresh = proximity_thresh
        self.appearance_thresh = appearance_thresh
        self.encoder = encoder or patch_appearance_encoder
        self._frame_feats: Optional[np.ndarray] = None

    @staticmethod
    def _apply_affine(track: Track, H: np.ndarray) -> None:
        b = track.xyxy
        pts = np.array([[b[0], b[1]], [b[2], b[3]]], np.float32)
        warped = pts @ H[:, :2].T + H[:, 2]
        xyah = xyxy2xyah(np.array([warped[0, 0], warped[0, 1], warped[1, 0], warped[1, 1]]))
        track.mean[:4] = xyah

    def _feat_of(self, i: int):
        if self._frame_feats is None or i >= len(self._frame_feats):
            return None
        return self._frame_feats[i]

    def _stage1_cost(self, pool, boxes_hi, scores_hi, hi_idx):
        """Reference `BOTSORT.get_dists` (`bot_sort.py:178-192`): fused-score
        IoU distance, with ReID cosine distance taken elementwise-min after
        proximity/appearance gating."""
        iou_d = iou_distance(pool, boxes_hi)
        cost = iou_d
        if self.fuse_score and cost.size:
            cost = 1.0 - (1.0 - cost) * scores_hi[None, :]
        if self.with_reid and cost.size and self._frame_feats is not None:
            emb = embedding_distance(pool, self._frame_feats[hi_idx]) / 2.0
            emb[emb > self.appearance_thresh] = 1.0
            emb[iou_d > self.proximity_thresh] = 1.0
            cost = np.minimum(cost, emb)
        return cost

    def update(self, boxes, scores, classes, frame_bgr: Optional[np.ndarray] = None):
        if frame_bgr is not None:
            H = self.gmc.apply(frame_bgr)
            for t in self.tracked + self.lost:
                self._apply_affine(t, H)
            if self.with_reid and len(boxes):
                self._frame_feats = self.encoder(frame_bgr, boxes)
            else:
                self._frame_feats = None
        else:
            self._frame_feats = None
        return super().update(boxes, scores, classes)
