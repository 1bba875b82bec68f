from tamtr_tpu.losses.detr_loss import DETRLossConfig, rtdetr_detection_loss  # noqa: F401
from tamtr_tpu.losses.matcher import hungarian_match  # noqa: F401
