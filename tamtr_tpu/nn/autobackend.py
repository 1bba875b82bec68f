"""Unified multi-backend inference wrapper (reference `nn/autobackend.py`).

Backends:
- "jax"        : native — a TAMTRModel + orbax/npz weights (fastest on TPU).
- "savedmodel" : TF SavedModel exported by `engine/exporter.py` (TF-serving
                 path; requires tensorflow).

The reference's ONNX/TensorRT/OpenVINO/CoreML/TFLite/ncnn/paddle backends are
GPU/mobile runtimes; the TPU serving story is jax or SavedModel.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Optional

import numpy as np


class AutoBackend:
    def __init__(
        self,
        weights: str | Path,
        model_cfg: str = "tamtr.yaml",
        nc: Optional[int] = None,
        imgsz: int = 640,
    ) -> None:
        self.imgsz = imgsz
        p = Path(weights)
        if p.is_dir() and (p / "saved_model.pb").exists():
            self.backend = "savedmodel"
            import tensorflow as tf

            self._tf = tf.saved_model.load(str(p))
            self._fn = self._tf.f
        else:
            self.backend = "jax"
            import jax

            from tamtr_tpu.engine.checkpoint import load_checkpoint_raw
            from tamtr_tpu.nn.graph import TAMTRModel

            state, meta = load_checkpoint_raw(p)
            nc = nc or meta.get("nc")
            assert nc, "pass nc=... for checkpoints without metadata"
            self.model = TAMTRModel.from_yaml(
                meta.get("model_cfg", model_cfg), nc=nc, max_gt=meta.get("max_gt", 128)
            )
            variables = {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
            self._fn = jax.jit(
                lambda img, txt: self.model.apply(variables, img, txt, None, False)["pred"]
            )
        self.nc = nc

    def __call__(self, img: np.ndarray, txt_feats: np.ndarray) -> np.ndarray:
        """img (B, H, W, 3) float32 [0,1]; txt (B, K, 512) -> (B, nq, 4+nc)."""
        if self.backend == "savedmodel":
            import tensorflow as tf

            return self._fn(tf.constant(img), tf.constant(txt_feats)).numpy()
        import jax

        return np.asarray(jax.device_get(self._fn(img, txt_feats)))

    def warmup(self, batch: int = 1, n_text: int = 10) -> None:
        img = np.zeros((batch, self.imgsz, self.imgsz, 3), np.float32)
        txt = np.zeros((batch, n_text, 512), np.float32)
        self(img, txt)
