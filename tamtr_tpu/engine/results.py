"""Prediction results container (reference `engine/results.py`).

`Results` wraps one image's detections with the reference's accessor/output
surface: `.boxes` (xyxy/conf/cls arrays), `.plot()`, `.save()`,
`.save_txt()`, `.tojson()`. Dict-style access keeps backward compatibility
with code that treats results as mappings.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class Boxes:
    """Detection boxes accessor: xyxy pixels + conf + cls."""

    def __init__(self, xyxy: np.ndarray, conf: np.ndarray, cls: np.ndarray):
        self.xyxy = np.asarray(xyxy, np.float32).reshape(-1, 4)
        self.conf = np.asarray(conf, np.float32).reshape(-1)
        self.cls = np.asarray(cls).reshape(-1)

    def __len__(self) -> int:
        return len(self.conf)

    @property
    def xywh(self) -> np.ndarray:
        b = self.xyxy
        return np.stack(
            [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]],
            -1,
        )


class Results:
    def __init__(
        self,
        path: str,
        boxes: np.ndarray,
        scores: np.ndarray,
        labels: np.ndarray,
        names: Sequence[str],
        orig_shape: Optional[tuple] = None,
        masks: Optional[np.ndarray] = None,
        orig_img: Optional[np.ndarray] = None,
    ):
        self.path = path
        self.names = list(names)
        self.boxes = Boxes(boxes, scores, labels)
        self.orig_shape = orig_shape
        # (N, Hm, Wm) sigmoid mask probabilities at proto resolution, or None
        self.masks = masks
        # BGR source frame for non-file sources (video/webcam/array) so
        # plot()/save() work without re-reading from disk
        self.orig_img = orig_img

    def __len__(self) -> int:
        return len(self.boxes)

    # dict-compat for earlier callers
    def __getitem__(self, key: str):
        return {
            "path": self.path,
            "boxes": self.boxes.xyxy,
            "scores": self.boxes.conf,
            "labels": self.boxes.cls,
            "names": self.names,
        }[key]

    def __contains__(self, key: str) -> bool:
        return key in ("path", "boxes", "scores", "labels", "names")

    def plot(self, line_width: Optional[int] = None, mask_alpha: float = 0.4) -> np.ndarray:
        import cv2

        from tamtr_tpu.utils.plotting import annotate_image

        from tamtr_tpu.utils.patches import imread as _imread

        img = self.orig_img.copy() if self.orig_img is not None else _imread(self.path)
        if self.masks is not None and len(self.masks):
            from tamtr_tpu.utils.plotting import _palette

            colors = _palette(max(len(self.names), 1))
            overlay = img.astype(np.float32)
            for m, l in zip(self.masks, self.boxes.cls):
                mm = cv2.resize(
                    m.astype(np.float32), (img.shape[1], img.shape[0])
                ) > 0.5
                c = np.array(colors[int(l) % len(colors)], np.float32)
                overlay[mm] = overlay[mm] * (1 - mask_alpha) + c * mask_alpha
            img = overlay.astype(np.uint8)
        return annotate_image(
            img, self.boxes.xyxy, self.boxes.conf, self.boxes.cls, self.names, line_width
        )

    def save(self, path: str | Path) -> None:
        from tamtr_tpu.utils.patches import imwrite

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        # unicode-safe write; cv2.imwrite returns False silently on non-ASCII
        # paths on some platforms — surface the failure (ADVICE r4 low#4)
        if not imwrite(str(path), self.plot()):
            raise OSError(f"failed to write annotated image to {path}")

    def save_txt(self, path: str | Path, save_conf: bool = False) -> None:
        """YOLO-format lines: cls cx cy w h [conf] normalized to orig_shape."""
        oh, ow = self.orig_shape or (1, 1)
        lines = []
        for b, c, l in zip(self.boxes.xywh, self.boxes.conf, self.boxes.cls):
            vals = [int(l), b[0] / ow, b[1] / oh, b[2] / ow, b[3] / oh]
            if save_conf:
                vals.append(float(c))
            lines.append(" ".join(f"{v:.6g}" for v in vals))
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text("\n".join(lines))

    def tojson(self) -> str:
        out = []
        for b, c, l in zip(self.boxes.xyxy, self.boxes.conf, self.boxes.cls):
            name = self.names[int(l)] if int(l) < len(self.names) else str(int(l))
            out.append(
                {
                    "name": name,
                    "class": int(l),
                    "confidence": round(float(c), 5),
                    "box": {"x1": float(b[0]), "y1": float(b[1]), "x2": float(b[2]), "y2": float(b[3])},
                }
            )
        return json.dumps(out)


class AnnotatedVideoWriter:
    """Annotated-video output for predict/track on video/stream sources
    (reference predictor save path, `engine/predictor.py:151-185`: plotted
    frames written through cv2.VideoWriter). Lazily opens on the first
    frame so the output size matches the annotated frame."""

    def __init__(self, out_path, fps: float = 30.0):
        from pathlib import Path as _P

        self.out_path = _P(out_path)
        self.fps = float(fps) if fps and fps > 0 else 30.0
        self._writer = None

    def write(self, result: "Results") -> None:
        import cv2

        frame = result.plot()
        if self._writer is None:
            self.out_path.parent.mkdir(parents=True, exist_ok=True)
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            h, w = frame.shape[:2]
            self._writer = cv2.VideoWriter(
                str(self.out_path), fourcc, self.fps, (w, h)
            )
        self._writer.write(frame)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
