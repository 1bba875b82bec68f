"""Auto-annotation: detector boxes -> SAM masks (reference `data/annotator.py`).

Runs a detection model over a folder, prompts SAM with each detection box,
and writes YOLO-segment txt labels (class + normalized polygon).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import numpy as np


def _mask_to_polygon(mask: np.ndarray, max_points: int = 64) -> Optional[np.ndarray]:
    """Largest external contour of a bool mask, subsampled (N, 2) pixels."""
    import cv2

    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    if not contours:
        return None
    c = max(contours, key=cv2.contourArea).reshape(-1, 2)
    if len(c) < 3:
        return None
    if len(c) > max_points:
        c = c[:: len(c) // max_points][:max_points]
    return c.astype(np.float32)


def auto_annotate(
    data: str | Path,
    det_model: Any,
    sam_model: Any = "mobile_sam",
    conf: float = 0.25,
    output_dir: str | Path | None = None,
) -> Path:
    """Annotate every image under `data` (reference `annotator.py:auto_annotate`).

    det_model: a TAMTR/YOLO facade (or Engine) with trained weights;
    sam_model: a SAM facade / SAMPredictor / builder name.
    Writes `<stem>.txt` files with `cls x1 y1 x2 y2 ...` normalized polygons.
    """
    from tamtr_tpu.api import SAM
    from tamtr_tpu.models.sam.predict import SAMPredictor

    data = Path(data)
    output_dir = Path(output_dir or data.parent / f"{data.stem}_auto_annotate_labels")
    output_dir.mkdir(parents=True, exist_ok=True)

    if isinstance(sam_model, str):
        sam_pred = SAM(sam_model).predictor
    elif isinstance(sam_model, SAM):
        sam_pred = sam_model.predictor
    elif isinstance(sam_model, SAMPredictor):
        sam_pred = sam_model
    else:
        sam_pred = sam_model

    results = det_model.predict(str(data), conf=conf)
    for r in results:
        boxes = r.boxes.xyxy
        if len(boxes) == 0:
            continue
        sam_res = sam_pred(r.path, bboxes=boxes)[0]
        oh, ow = sam_res.orig_shape
        lines = []
        for cls, mask in zip(r.boxes.cls, sam_res.masks):
            poly = _mask_to_polygon(np.asarray(mask) > 0.5)
            if poly is None:
                continue
            pts = " ".join(f"{x / ow:.6f} {y / oh:.6f}" for x, y in poly)
            lines.append(f"{int(cls)} {pts}")
        if lines:
            (output_dir / f"{Path(r.path).stem}.txt").write_text("\n".join(lines) + "\n")
    return output_dir
