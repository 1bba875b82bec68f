from tamtr_tpu.data.dataset import DetectionDataset, build_loader  # noqa: F401
from tamtr_tpu.data.text import class_text_embeddings  # noqa: F401
