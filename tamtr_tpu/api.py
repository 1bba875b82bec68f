"""Public model facade (the reference's `RTDETRWorld`).

Routes train/val/predict to the engine components. Fleshed out as the engine
lands; importable from day one so `from tamtr_tpu import TAMTR` always works.
"""

from __future__ import annotations

from typing import Any, Optional


class TAMTR:
    """Text-guided multi-modal detector facade (reference `models/rtdetrworld/model.py`)."""

    def __init__(self, model: str = "tamtr.yaml", task: str = "detect") -> None:
        self.model_cfg = model
        self.task = task
        self._engine = None

    def _lazy_engine(self):
        if self._engine is None:
            from tamtr_tpu.engine.model import Engine

            self._engine = Engine(self.model_cfg)
        return self._engine

    def train(self, **kwargs: Any):
        return self._lazy_engine().train(**kwargs)

    def val(self, **kwargs: Any):
        return self._lazy_engine().val(**kwargs)

    def predict(self, source: Any = None, **kwargs: Any):
        return self._lazy_engine().predict(source, **kwargs)

    def tune(self, iterations: int = 10, **kwargs: Any):
        """Mutation-based hyperparameter evolution over short trainings."""
        return self._lazy_engine().tune(iterations, **kwargs)

    def export(self, fmt: str = "orbax", **kwargs: Any):
        """Export weights (orbax / savedmodel via jax2tf / tflite / npz)."""
        return self._lazy_engine().export(fmt, **kwargs)

    def load(self, weights: str, **kwargs: Any) -> "TAMTR":
        """Load a trained checkpoint for val/predict."""
        self._lazy_engine().load(weights, **kwargs)
        return self

    def set_classes(self, classes, embeddings=None):
        """Open-vocabulary retarget: supply class names (+ precomputed text embeddings)."""
        return self._lazy_engine().set_classes(classes, embeddings)
