"""TAM-TR on TPU: a TPU-native (JAX/XLA/Pallas/pjit) text-guided multi-modal detector framework.

Brand-new implementation with the capabilities of the reference TAM-TR
(text-guided attention multi-modal transformer for UAV imagery, ISPRS 2025;
see SURVEY.md for the structural analysis of the reference).

Public API mirrors the reference's `RTDETRWorld` facade:

    from tamtr_tpu import TAMTR
    model = TAMTR("tamtr.yaml")
    model.train(data="visdrone.yaml", imgsz=640, epochs=300, batch=6)
    model.val(data="visdrone.yaml", conf=0.4, iou=0.6)
    model.predict("images/", conf=0.4)
"""

__version__ = "0.1.0"

from tamtr_tpu.api import (  # noqa: E402,F401
    FastSAM,
    NAS,
    RTDETR,
    RTDETRWorld,
    SAM,
    TAMTR,
    YOLO,
)

__all__ = [
    "TAMTR",
    "RTDETRWorld",
    "YOLO",
    "RTDETR",
    "SAM",
    "FastSAM",
    "NAS",
    "__version__",
]
