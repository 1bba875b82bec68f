from tamtr_tpu.ops.boxes import (  # noqa: F401
    bbox_iou,
    box_iou_pairwise,
    ltwh2xywh,
    ltwh2xyxy,
    xywh2ltwh,
    xywh2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
)
