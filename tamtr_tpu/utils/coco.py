"""COCO-format prediction dump + optional pycocotools evaluation.

The reference validator's `save_json`/`eval_json` path
(`models/yolo/detect/val.py:230-268`): predictions are written as
[{image_id, category_id, bbox (ltwh), score}] and scored with pycocotools
when a ground-truth annotation json is available.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def predictions_to_coco(
    per_image: List[Dict],
    save_path: str | Path,
    class_map: Optional[Sequence[int]] = None,
) -> Path:
    """per_image: [{image_id, boxes (N,4) xyxy, scores (N,), labels (N,)}]."""
    out = []
    for rec in per_image:
        boxes = np.asarray(rec["boxes"], np.float64)
        ltwh = boxes.copy()
        ltwh[:, 2:] = boxes[:, 2:] - boxes[:, :2]
        for b, s, l in zip(ltwh, rec["scores"], rec["labels"]):
            cid = int(class_map[int(l)]) if class_map is not None else int(l)
            out.append(
                {
                    "image_id": rec["image_id"],
                    "category_id": cid,
                    "bbox": [round(float(x), 3) for x in b],
                    "score": round(float(s), 5),
                }
            )
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    save_path.write_text(json.dumps(out))
    return save_path


def evaluate_coco(pred_json: str | Path, anno_json: str | Path) -> Optional[Dict[str, float]]:
    """pycocotools bbox eval; returns {mAP50-95, mAP50} or None if unavailable."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        return None
    anno = COCO(str(anno_json))
    pred = anno.loadRes(str(pred_json))
    ev = COCOeval(anno, pred, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return {"mAP50-95": float(ev.stats[0]), "mAP50": float(ev.stats[1])}
